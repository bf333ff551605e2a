"""Raw CSV extract (SURVEY.md S5/F11 — the reference's SampleData bootstrap,
DBConnector.java:534-631): headered CSV dump with either lossless quoting or
the reference's lossy comma-to-space rewrite."""

from __future__ import annotations

import glob

from mas_scada_bulkingest_spark.sources.extract import extract_raw_csv, sample_schema


def _read_single_csv(spark, out_dir):
    return spark.read.option("header", "true").csv(out_dir)


def test_extract_lossless_quoting_roundtrip(spark, tmpdir_path):
    df = spark.createDataFrame(
        [(1, "plain"), (2, "has, comma"), (3, 'quote " and, comma')],
        "id int, txt string",
    )
    extract_raw_csv(df, tmpdir_path + "/out", single_file=True)
    files = glob.glob(tmpdir_path + "/out/*.csv")
    assert len(files) == 1  # single_file coalesces; header written once
    with open(files[0]) as f:
        assert f.readline().strip() == "id,txt"
    back = _read_single_csv(spark, tmpdir_path + "/out")
    got = {r["id"]: r["txt"] for r in back.collect()}
    # quoting preserves commas exactly (unlike the reference's rewrite)
    assert got == {"1": "plain", "2": "has, comma", "3": 'quote " and, comma'}


def test_extract_lossy_comma_sanitization(spark, tmpdir_path):
    df = spark.createDataFrame(
        [(1, "a,b", 2.5), (2, "c", 3.5)], "id int, txt string, v double"
    )
    extract_raw_csv(df, tmpdir_path + "/out", lossy_commas=True, single_file=True)
    back = _read_single_csv(spark, tmpdir_path + "/out")
    got = {r["id"]: r["txt"] for r in back.collect()}
    # the reference's value.replaceAll(",", " ") — commas become spaces,
    # non-string columns untouched
    assert got == {"1": "a b", "2": "c"}
    assert {r["v"] for r in back.collect()} == {"2.5", "3.5"}


def test_sample_schema_discovery(spark, tmpdir_path):
    spark.createDataFrame([(1, "x")], "id int, txt string").write.parquet(
        tmpdir_path + "/p"
    )
    info = sample_schema(spark, tmpdir_path + "/p", n=10)
    assert info["fields"] == [
        {"name": "id", "type": "int", "nullable": True},
        {"name": "txt", "type": "string", "nullable": True},
    ]
    assert info["sample_rows"] == 1

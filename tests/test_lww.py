"""LWW collapse: hash-agg, window, and salted two-phase forms must agree
(SURVEY.md W1; reference parity: unique-index LWW, MonitorTable.java:70-76)."""

from __future__ import annotations

import pandas as pd

from mas_scada_bulkingest_spark.operators.lww import collapse_lww, collapse_lww_window
from mas_scada_bulkingest_spark.sources import generate_changelog


def _spark_changes(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=40, mean_turns=5, seed=13)
    return spark.read.option("mergeSchema", "true").parquet(tmpdir_path + "/log")


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    d = df.sort_values(["ts", "lsn"], kind="stable").groupby(
        ["conv_id", "turn_idx"], as_index=False
    ).tail(1)
    return d.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_collapse_variants_agree(spark, tmpdir_path):
    df = _spark_changes(spark, tmpdir_path)
    pdf = df.toPandas()
    exp = _expected(pdf)[["conv_id", "turn_idx", "lsn"]]

    for variant in (
        collapse_lww(df),
        collapse_lww(df, two_phase_salt=8),
        collapse_lww_window(df),
    ):
        got = (
            variant.select("conv_id", "turn_idx", "lsn")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )


def test_collapse_keeps_all_columns(spark, tmpdir_path):
    df = _spark_changes(spark, tmpdir_path)
    out = collapse_lww(df)
    assert out.columns == df.columns
    assert out.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0

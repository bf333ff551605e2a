"""Classifier + scalar-function parity with the reference's unit tests
(ParseTagnameTest.java, TagDataTest.java — see SURVEY.md §5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mas_scada_bulkingest_spark.functions.ids import name_uuid_expr, name_uuid_udf
from mas_scada_bulkingest_spark.functions.tagpath import (
    ackby_from_alarm_source,
    last_segment,
    null_default,
    tag_from_alarm_source,
)
from mas_scada_bulkingest_spark.functions.text import normalize_text
from mas_scada_bulkingest_spark.operators.classify import classify_expr

# ordered patterns mirroring config/connection.json:31-47 in the reference
PATTERNS = [
    ("CA3DeviceType", r"ca3/.*"),
    ("CA5DeviceType", r"ca5/.*"),
    ("DefaultType", r".*"),
]
DISCARD = [r".*/_meta/.*"]


def _classify(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], ["tag"])
    out = df.select(classify_expr("tag", **kw).alias("t")).collect()
    return [r["t"] for r in out]


def test_first_match_wins(spark):
    # ParseTagnameTest.java:119-130 analog
    got = _classify(
        spark,
        ["ca3/boiler/temp", "ca5/hvac/fan", "other/x"],
        patterns=PATTERNS,
        discard=DISCARD,
        default_type="DefaultType",
    )
    assert got == ["CA3DeviceType", "CA5DeviceType", "DefaultType"]


def test_anchored_like_java_matches(spark):
    # ParseTagnameTest.java:131-132 — bare prefix "ca5" must NOT match "ca5/.*"
    got = _classify(spark, ["ca5"], patterns=PATTERNS[:2], discard=[], default_type=None)
    assert got == [None]


def test_discard_forces_default(spark):
    got = _classify(
        spark,
        ["ca3/_meta/x", "ca3/real/x"],
        patterns=PATTERNS[:2],
        discard=DISCARD,
        default_type="Fallback",
    )
    assert got == ["Fallback", "CA3DeviceType"]


def test_pattern_with_spaces_and_infix(spark):
    # ParseTagnameTestPatterns.java:110-122: "ca3/hvac/.*zonetemp" matches
    # "ca3/hvac/tcp 7/rfu1_11zonetemp"
    got = _classify(
        spark,
        ["ca3/hvac/tcp 7/rfu1_11zonetemp"],
        patterns=[("HvacZone", r"ca3/hvac/.*zonetemp")],
        default_type=None,
    )
    assert got == ["HvacZone"]


def test_name_uuid_java_parity(spark):
    # Expected values computed with java.util.UUID.nameUUIDFromBytes (JDK 17)
    expected = {
        "site1:conv-0": "8aac6be4-7383-367e-81c9-a8b80ee828ab",
        "ca3/boiler/temp": "e9f8c755-f3ad-33d4-ae62-48e6fb69b6b5",
        "x": "9dd4e461-268c-3034-b5c8-564e155c67a6",
        "spark-graft": "43310bf7-5382-36ef-a05f-00e6141945c9",
    }
    df = spark.createDataFrame([(k,) for k in expected], ["name"])
    rows = df.select(
        "name",
        name_uuid_expr("name").alias("expr"),
        name_uuid_udf("name").alias("udf"),
    ).collect()
    for r in rows:
        assert r["expr"] == expected[r["name"]], "JVM expression parity"
        assert r["udf"] == expected[r["name"]], "pandas UDF parity"


def test_scalar_helpers(spark):
    df = spark.createDataFrame(
        [("ca3/boiler/temp", "prov:default:/tag:ca3/boiler/temp:/alm:high", "ack usr:bob", None)],
        "tag string, source string, ack string, val double",
    )
    r = df.select(
        last_segment("tag").alias("leaf"),
        tag_from_alarm_source("source").alias("tp"),
        ackby_from_alarm_source("ack").alias("user"),
        null_default(F.col("val").cast("double"), 0.0).alias("v"),
    ).collect()[0]
    assert r["leaf"] == "temp"
    assert r["tp"] == "ca3/boiler/temp"
    assert r["user"] == "bob"
    assert r["v"] == 0.0


def test_normalize_text_vectorized(spark):
    df = spark.createDataFrame([("  á  b\t\nc  ",), (None,)], ["t"])
    got = [r[0] for r in df.select(normalize_text("t")).collect()]
    assert got[0] == "á b c"  # NFC composes a+combining-acute, ws collapsed
    assert got[1] is None


def test_apply_column_mapping(spark):
    """F2/P2/P3: explicit renames + uppercase passthrough of unknown source
    columns + constant injection + discard (reference getSourceMap surface,
    DBConnector.java:426-461)."""
    from mas_scada_bulkingest_spark.functions.tagpath import apply_column_mapping

    df = spark.createDataFrame(
        [("a/b", 1, 2.5, "x")], "tagpath string, tagid int, val double, junk string"
    )
    out = apply_column_mapping(
        df,
        mapping={"tagpath": "TAG", "tagid": "TAGID"},
        constants={"EVENTTYPE": "device", "FORMAT": "JSON"},
        discard=["junk"],
    )
    assert out.columns == ["TAG", "TAGID", "VAL", "EVENTTYPE", "FORMAT"]
    row = out.collect()[0]
    assert (row["TAG"], row["TAGID"], row["VAL"]) == ("a/b", 1, 2.5)
    assert (row["EVENTTYPE"], row["FORMAT"]) == ("device", "JSON")

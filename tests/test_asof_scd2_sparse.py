"""Unit tests for the round-4 closers: as-of join, SCD2 history, and
per-column (sparse-update) LWW collapse.

Each operator also has a full DuckDB-oracle entry (cdc_asof_enrich,
cdc_scd2_history, cdc_sparse_state) checked by tools/verify_oracles.py;
these tests pin the tricky edge semantics on handcrafted rows where the
expected answer is readable by eye.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mas_scada_bulkingest_spark.operators.asof import asof_join
from mas_scada_bulkingest_spark.operators.lww import collapse_lww_columnar
from mas_scada_bulkingest_spark.operators.scd2 import scd2_history


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------- as-of join


def test_asof_join_basic_and_inclusive(spark):
    dims = spark.createDataFrame(
        [
            ("c1", _ts("2024-01-01 00:10:00"), "open", 1),
            ("c1", _ts("2024-01-01 00:30:00"), "escalated", 2),
            ("c2", _ts("2024-01-01 00:20:00"), "open", 3),
        ],
        "conv_id string, ts timestamp, status string, status_lsn long",
    )
    facts = spark.createDataFrame(
        [
            ("c1", 100, _ts("2024-01-01 00:05:00")),  # before any dim -> NULL
            ("c1", 101, _ts("2024-01-01 00:10:00")),  # ts == dim ts -> inclusive
            ("c1", 102, _ts("2024-01-01 00:29:59")),  # between dims -> first
            ("c1", 103, _ts("2024-01-01 01:00:00")),  # after last -> latest
            ("c2", 200, _ts("2024-01-01 00:25:00")),
            ("c3", 300, _ts("2024-01-01 00:25:00")),  # key with no dims -> NULL
        ],
        "conv_id string, fact_id long, ts timestamp",
    )
    out = asof_join(facts, dims, on=["conv_id"], right_tiebreak="status_lsn")
    got = {r["fact_id"]: r["status"] for r in out.collect()}
    assert got == {
        100: None,
        101: "open",
        102: "open",
        103: "escalated",
        200: "open",
        300: None,
    }
    # every fact row survives exactly once (left join)
    assert out.count() == facts.count()


def test_asof_join_equal_instant_tiebreak(spark):
    # two dim rows at the SAME (key, instant): max-tiebreak must win
    dims = spark.createDataFrame(
        [
            ("c1", _ts("2024-01-01 00:10:00"), "a", 1),
            ("c1", _ts("2024-01-01 00:10:00"), "b", 7),
            ("c1", _ts("2024-01-01 00:10:00"), "c", 4),
        ],
        "conv_id string, ts timestamp, status string, status_lsn long",
    )
    facts = spark.createDataFrame(
        [("c1", 1, _ts("2024-01-01 00:15:00"))],
        "conv_id string, fact_id long, ts timestamp",
    )
    out = asof_join(facts, dims, on=["conv_id"], right_tiebreak="status_lsn")
    row = out.collect()[0]
    assert (row["status"], row["status_lsn"]) == ("b", 7)


def test_asof_broadcast_strategy_matches_union(spark):
    dims = spark.createDataFrame(
        [
            ("c1", _ts("2024-01-01 00:10:00"), "open", 1),
            ("c1", _ts("2024-01-01 00:30:00"), "escalated", 2),
            ("c1", _ts("2024-01-01 00:30:00"), "dupe-instant", 1),
            ("c2", _ts("2024-01-01 00:20:00"), "open", 3),
        ],
        "conv_id string, ts timestamp, status string, status_lsn long",
    )
    facts = spark.createDataFrame(
        [
            ("c1", 100, _ts("2024-01-01 00:05:00")),
            ("c1", 101, _ts("2024-01-01 00:10:00")),
            ("c1", 102, _ts("2024-01-01 00:45:00")),
            ("c2", 200, _ts("2024-01-01 00:25:00")),
            ("c3", 300, _ts("2024-01-01 00:25:00")),
        ],
        "conv_id string, fact_id long, ts timestamp",
    )
    kw = dict(on=["conv_id"], right_tiebreak="status_lsn")
    a = sorted(
        map(tuple, asof_join(facts, dims, strategy="union", **kw).collect())
    )
    b = sorted(
        map(tuple, asof_join(facts, dims, strategy="broadcast", **kw).collect())
    )
    assert a == b
    got = {r["fact_id"]: r["status"] for r in
           asof_join(facts, dims, strategy="broadcast", **kw).collect()}
    assert got == {100: None, 101: "open", 102: "escalated", 200: "open", 300: None}


def test_asof_broadcast_never_shuffles_facts(spark, tmpdir_path):
    # the scale contract: facts side is map-only — the ONLY exchange in
    # the plan is the dim-side aggregation feeding the broadcast
    dims = spark.createDataFrame(
        [("c1", _ts("2024-01-01 00:10:00"), "open", 1)],
        "conv_id string, ts timestamp, status string, status_lsn long",
    )
    spark.createDataFrame(
        [("c1", 100, _ts("2024-01-01 00:15:00"))],
        "conv_id string, fact_id long, ts timestamp",
    ).write.mode("overwrite").parquet(tmpdir_path + "/facts")
    facts = spark.read.parquet(tmpdir_path + "/facts")
    out = asof_join(
        facts, dims, on=["conv_id"], right_tiebreak="status_lsn",
        strategy="broadcast",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert out.collect()[0]["status"] == "open"


def test_asof_null_payload_row_semantics_both_strategies(spark):
    # ASOF is a ROW join: the matched dim row's NULL column must be
    # delivered as NULL, never patched with an older row's value — and
    # multi-column payloads must never stitch columns from different rows
    dims = spark.createDataFrame(
        [
            ("c1", _ts("2024-01-01 00:10:00"), "open", "alice", 1),
            ("c1", _ts("2024-01-01 00:30:00"), None, "bob", 2),
        ],
        "conv_id string, ts timestamp, status string, owner string, status_lsn long",
    )
    facts = spark.createDataFrame(
        [("c1", 1, _ts("2024-01-01 00:45:00"))],
        "conv_id string, fact_id long, ts timestamp",
    )
    for strat in ("union", "broadcast"):
        row = asof_join(
            facts, dims, on=["conv_id"], right_tiebreak="status_lsn",
            strategy=strat,
        ).collect()[0]
        assert (row["status"], row["owner"]) == (None, "bob"), strat


def test_asof_unknown_strategy_raises(spark):
    dims = spark.createDataFrame(
        [("c1", _ts("2024-01-01 00:10:00"), "x")],
        "conv_id string, ts timestamp, status string",
    )
    facts = spark.createDataFrame(
        [("c1", _ts("2024-01-01 00:15:00"))], "conv_id string, ts timestamp"
    )
    import pytest

    with pytest.raises(ValueError, match="strategy"):
        asof_join(facts, dims, on=["conv_id"], strategy="sorted-merge")


def test_asof_join_payload_collision_raises(spark):
    dims = spark.createDataFrame(
        [("c1", _ts("2024-01-01 00:10:00"), "x")],
        "conv_id string, ts timestamp, text string",
    )
    facts = spark.createDataFrame(
        [("c1", _ts("2024-01-01 00:15:00"), "y")],
        "conv_id string, ts timestamp, text string",
    )
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(facts, dims, on=["conv_id"])


# ------------------------------------------------------------- SCD2 history


def test_scd2_versions_close_and_current(spark):
    ch = spark.createDataFrame(
        [
            # k1: two updates then delete -> two closed versions, none current
            ("k1", 1, _ts("2024-01-01 00:00:00"), "v1", "update"),
            ("k1", 2, _ts("2024-01-01 01:00:00"), "v2", "update"),
            ("k1", 3, _ts("2024-01-01 02:00:00"), None, "delete"),
            # k2: one update, still live -> open version, current
            ("k2", 4, _ts("2024-01-01 00:30:00"), "w1", "update"),
            # k3: delete then late re-insert -> re-insert is current
            ("k3", 5, _ts("2024-01-01 00:00:00"), "x1", "update"),
            ("k3", 6, _ts("2024-01-01 01:00:00"), None, "delete"),
            ("k3", 7, _ts("2024-01-01 02:00:00"), "x2", "update"),
        ],
        "k string, lsn long, ts timestamp, payload string, op string",
    )
    hist = scd2_history(ch, keys=("k",), order=("ts", "lsn"))
    rows = {r["lsn"]: r for r in hist.collect()}
    assert set(rows) == {1, 2, 4, 5, 7}  # deletes emit nothing
    assert rows[1]["valid_to"] == _ts("2024-01-01 01:00:00")
    assert rows[2]["valid_to"] == _ts("2024-01-01 02:00:00")  # closed by delete
    assert not rows[2]["is_current"]
    assert rows[4]["valid_to"] is None and rows[4]["is_current"]
    assert rows[5]["valid_to"] == _ts("2024-01-01 01:00:00")
    assert rows[7]["valid_to"] is None and rows[7]["is_current"]
    assert "op" not in hist.columns


def test_scd2_out_of_order_log_is_event_time_ordered(spark):
    # arrival order scrambled; versions follow (ts, lsn), not arrival
    ch = spark.createDataFrame(
        [
            ("k", 9, _ts("2024-01-01 02:00:00"), "late-arriving-final", "update"),
            ("k", 2, _ts("2024-01-01 00:00:00"), "first", "update"),
            ("k", 5, _ts("2024-01-01 01:00:00"), "second", "update"),
        ],
        "k string, lsn long, ts timestamp, payload string, op string",
    )
    hist = scd2_history(ch, keys=("k",), order=("ts", "lsn")).orderBy("valid_from")
    got = [(r["payload"], r["valid_to"] is None, r["is_current"]) for r in hist.collect()]
    assert got == [
        ("first", False, False),
        ("second", False, False),
        ("late-arriving-final", True, True),
    ]


# ------------------------------------------------- columnar (sparse) LWW


def test_columnar_lww_resolves_each_column_independently(spark):
    ch = spark.createDataFrame(
        [
            # key A: full image, then role-only, then text-only
            ("A", 1, _ts("2024-01-01 00:00:00"), "user", "hello"),
            ("A", 2, _ts("2024-01-01 01:00:00"), "assistant", None),
            ("A", 3, _ts("2024-01-01 02:00:00"), None, "goodbye"),
            # key B: only ever sparse in one column
            ("B", 4, _ts("2024-01-01 00:00:00"), None, "b-text"),
        ],
        "k string, lsn long, ts timestamp, role string, text string",
    )
    out = collapse_lww_columnar(
        ch,
        keys=("k",),
        order=("ts", "lsn"),
        value_cols=("role", "text"),
        track_last_of=("lsn",),
        count_alias="n",
    )
    rows = {r["k"]: r for r in out.collect()}
    a = rows["A"]
    # role from lsn=2 (latest non-null role), text from lsn=3
    assert (a["role"], a["text"], a["lsn"], a["n"]) == ("assistant", "goodbye", 3, 3)
    b = rows["B"]
    assert (b["role"], b["text"], b["lsn"], b["n"]) == (None, "b-text", 4, 1)


def test_columnar_lww_row_level_would_clobber(spark):
    # the exact failure mode the operator exists for: the LATEST change has
    # a NULL column; row-level LWW returns NULL, columnar keeps the value
    from mas_scada_bulkingest_spark.operators.lww import collapse_lww

    ch = spark.createDataFrame(
        [
            ("A", 1, _ts("2024-01-01 00:00:00"), "user", "hello"),
            ("A", 2, _ts("2024-01-01 01:00:00"), None, "patched"),
        ],
        "k string, lsn long, ts timestamp, role string, text string",
    )
    row_level = collapse_lww(ch, keys=("k",), order=("ts", "lsn")).collect()[0]
    assert row_level["role"] is None  # clobbered
    columnar = collapse_lww_columnar(
        ch, keys=("k",), order=("ts", "lsn"), value_cols=("role", "text")
    ).collect()[0]
    assert (columnar["role"], columnar["text"]) == ("user", "patched")


def test_columnar_lww_out_of_order_ties_on_lsn(spark):
    # same ts, different lsn: higher lsn wins per column
    ch = spark.createDataFrame(
        [
            ("A", 5, _ts("2024-01-01 00:00:00"), "late", None),
            ("A", 3, _ts("2024-01-01 00:00:00"), "early", "kept-text"),
        ],
        "k string, lsn long, ts timestamp, role string, text string",
    )
    out = collapse_lww_columnar(
        ch, keys=("k",), order=("ts", "lsn"), value_cols=("role", "text")
    ).collect()[0]
    assert (out["role"], out["text"]) == ("late", "kept-text")


def test_columnar_lww_plan_is_partial_aggregate(spark):
    # scale contract: declarative aggregate (map-side combine), no window sort
    ch = spark.createDataFrame(
        [("A", 1, _ts("2024-01-01 00:00:00"), "user", "x")],
        "k string, lsn long, ts timestamp, role string, text string",
    )
    out = collapse_lww_columnar(
        ch, keys=("k",), order=("ts", "lsn"), value_cols=("role", "text")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan

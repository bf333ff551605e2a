"""Manifest column stats + time-window data skipping (Iceberg-style).

Every snapshot commit records per-file [min, max] of the event-time column
(the first LWW-order column) from the parquet footers; ``read(min_event_time
=…, max_event_time=…)`` uses them to SKIP files that provably cannot
contribute to the window — lower-bound-only under merge-on-read (pruning a
winner below the bound can never promote a loser above it; both bounds under
copy-on-write). The reference's closest analog is the monthly-table routing
that limits each extraction to one month's table (dbutils.py advance-month
logic); here skipping falls out of file-level stats instead of a naming
convention.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

from conftest import assert_frames_equal

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _day(d: int, s: int = 0) -> datetime:
    return datetime(2024, 1, d, 0, 0, s)


def _epoch_rows(day: int, lsn0: int, n: int = 6):
    """n update rows to convs UNIQUE to this day (time-ordered binlog where
    each epoch touches fresh conversations), all with ts on ``day``."""
    return [
        (lsn0 + i, "update", f"c{day}-{i}", 0, "user", f"t{day}-{i}", None, _day(day, i))
        for i in range(n)
    ]


def _timeordered_table(spark, path, mode, n_epochs=4):
    tbl = create_transcripts_table(spark, path, n_buckets=4, mode=mode)
    for e in range(n_epochs):
        batch = spark.createDataFrame(_epoch_rows(day=e + 1, lsn0=100 * e), _COLS)
        apply_changes(tbl, batch, epoch_id=e)
    return tbl


def _pdf(df):
    return (
        df.select("conv_id", "turn_idx", "text", "ts", "lsn")
        .orderBy("conv_id", "turn_idx", "lsn")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stats_recorded_on_commit(spark, tmpdir_path):
    tbl = _timeordered_table(spark, tmpdir_path + "/t", mode="mor", n_epochs=1)
    stats = tbl._snapshot["file_stats"]
    files = [f for fs in tbl._snapshot["buckets"].values() for f in fs]
    assert files and all(f in stats for f in files)
    for mn, mx in (stats[f] for f in files):
        # fixed-width ISO strings, lexicographically ordered
        assert isinstance(mn, str) and isinstance(mx, str) and mn <= mx
        assert mn.startswith("2024-01-01 ")


def test_min_bound_prunes_files_and_is_exact_mor(spark, tmpdir_path):
    tbl = _timeordered_table(spark, tmpdir_path + "/t", mode="mor")
    full = tbl.read()
    expected = _pdf(full.filter(F.col("ts") >= F.lit("2024-01-03").cast("timestamp_ntz")))
    before = tbl.last_read_pruned_files
    win = tbl.read(min_event_time="2024-01-03")
    got = _pdf(win)
    assert tbl.last_read_pruned_files > before  # days 1-2 files skipped
    assert_frames_equal(got, expected)
    # the pruned MoR read keeps the exchange-free bucket-local plan
    assert "Exchange" not in win._jdf.queryExecution().executedPlan().toString()


def test_lower_bound_cannot_resurrect_losers(spark, tmpdir_path):
    """The MoR soundness argument, concretely: a key updated across the
    bound must show its winner; a key entirely below the bound must vanish;
    a delete above the bound must still hide its key even though the
    deleted row's own file is pruned."""
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    e0 = [
        (1, "update", "ka", 0, "u", "old-a", None, _day(1)),
        (2, "update", "kb", 0, "u", "only-old", None, _day(1, 1)),
        (3, "update", "kc", 0, "u", "doomed", None, _day(1, 2)),
    ]
    e1 = [
        (10, "update", "ka", 0, "u", "new-a", None, _day(3)),
        (11, "delete", "kc", 0, None, None, None, _day(3, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(e0, _COLS), epoch_id=0)
    apply_changes(tbl, spark.createDataFrame(e1, _COLS), epoch_id=1)

    got = _pdf(tbl.read(min_event_time=_day(2)))
    assert got["conv_id"].tolist() == ["ka"]  # kb below bound, kc deleted
    assert got["text"].tolist() == ["new-a"]
    # bound above everything -> empty, never a resurrected loser
    assert tbl.read(min_event_time=_day(4)).count() == 0


def test_cow_prunes_both_bounds(spark, tmpdir_path):
    # pick conv ids landing in DISTINCT buckets so each CoW epoch rewrite
    # stays a single-day file (pruning has something to skip)
    cand = spark.createDataFrame([(f"c{i}",) for i in range(32)], "conv_id string")
    rows = cand.select(
        "conv_id", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int").alias("b")
    ).collect()
    by_bucket: dict[int, str] = {}
    for r in rows:
        by_bucket.setdefault(r["b"], r["conv_id"])
    ids = list(by_bucket.values())[:3]
    assert len(ids) == 3

    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=8, mode="cow")
    for e, cid in enumerate(ids):
        batch = spark.createDataFrame(
            [(e + 1, "update", cid, 0, "u", f"d{e}", None, _day(e + 1))], _COLS
        )
        apply_changes(tbl, batch, epoch_id=e)

    before = tbl.last_read_pruned_files
    got = _pdf(tbl.read(min_event_time=_day(2), max_event_time=_day(2, 59)))
    assert got["text"].tolist() == ["d1"]
    assert tbl.last_read_pruned_files >= before + 2  # day-1 AND day-3 files


def test_compaction_recomputes_stats(spark, tmpdir_path):
    tbl = _timeordered_table(spark, tmpdir_path + "/t", mode="mor")
    assert tbl.compact(max_files=1) > 0
    stats = tbl._snapshot["file_stats"]
    files = [f for fs in tbl._snapshot["buckets"].values() for f in fs]
    assert files and all(stats.get(f) is not None for f in files)
    # windowed read still exact on the compacted layout (compacted files
    # span all days, so correctness must come from the residual filter)
    expected = _pdf(
        tbl.read().filter(F.col("ts") >= F.lit("2024-01-03").cast("timestamp_ntz"))
    )
    assert_frames_equal(_pdf(tbl.read(min_event_time="2024-01-03")), expected)


from datetime import timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# (lsn unique, conv, turn, is_delete, ts offset seconds — ties likely)
_event = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=300),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_event, min_size=1, max_size=30, unique_by=lambda e: e[0]),
    st.integers(min_value=0, max_value=300),
    st.sampled_from(["mor", "cow"]),
)
def test_windowed_read_equals_filtered_full_read(
    spark, tmp_path_factory, events, bound_s, mode
):
    """Property: for ANY changelog split into 2 epochs (with compaction) and
    ANY window bound, read(min_event_time=b) is EXACTLY the full live state
    filtered to winner ts >= b — file skipping can never change results,
    only which files are opened."""
    d = str(tmp_path_factory.mktemp("skip"))
    rows = [
        (
            lsn,
            "delete" if is_del else "update",
            f"c{conv}",
            turn,
            None if is_del else "u",
            None if is_del else f"t{lsn}",
            None,
            datetime(2024, 1, 1) + timedelta(seconds=dt_s),
        )
        for lsn, conv, turn, is_del, dt_s in events
    ]
    tbl = create_transcripts_table(spark, d + "/t", n_buckets=2, mode=mode)
    half = len(rows) // 2
    for e, ep in enumerate((rows[:half], rows[half:])):
        if ep:
            apply_changes(
                tbl,
                spark.createDataFrame(ep, _COLS),
                epoch_id=e,
                auto_compact_files=1 if mode == "mor" else None,
            )
    bound = datetime(2024, 1, 1) + timedelta(seconds=bound_s)
    want = _pdf(
        tbl.read().filter(
            F.col("ts") >= F.lit(bound.isoformat(sep=" ")).cast("timestamp_ntz")
        )
    )
    got = _pdf(tbl.read(min_event_time=bound))
    assert_frames_equal(got, want)


def test_unbounded_read_unchanged(spark, tmpdir_path):
    tbl = _timeordered_table(spark, tmpdir_path + "/t", mode="mor")
    assert tbl.read().count() == 6 * 4  # distinct convs per day x 4 days
    assert tbl.last_read_pruned_files == 0

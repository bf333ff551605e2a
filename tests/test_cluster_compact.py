"""Clustered compaction: ``compact(cluster_files=k)`` range-slices each
rewritten bucket on the event-time column so windowed reads keep skipping
files AFTER compaction (the Iceberg sort-order rewrite / Delta OPTIMIZE
ZORDER analog, one dimension). Plain compaction collapses a bucket to one
file spanning its whole time range — a ``read(min_event_time=…)`` then
degrades to bucket granularity; clustering restores file-level pruning at
unchanged bucket parallelism and identical results."""

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


def _rows(day: int, lsn0: int, n: int = 8):
    return [
        (lsn0 + i, "update", f"c{day}-{i}", 0, "user", f"t{day}-{i}", None, _day(day, i))
        for i in range(n)
    ]


def _build(spark, path, n_days=8, mode="mor"):
    """One epoch per day, every epoch touching every bucket (conv ids vary
    within the epoch), so after compaction each bucket's single file would
    span all ``n_days``."""
    tbl = create_transcripts_table(spark, path, n_buckets=4, mode=mode)
    for e in range(n_days):
        batch = spark.createDataFrame(_rows(day=e + 1, lsn0=100 * e), _COLS)
        apply_changes(tbl, batch, epoch_id=e)
    return tbl


def _pdf(df):
    return (
        df.select("conv_id", "turn_idx", "text", "ts", "lsn")
        .orderBy("conv_id", "turn_idx", "lsn")
        .toPandas()
        .reset_index(drop=True)
    )


def test_clustered_compact_prunes_windowed_read(spark, tmpdir_path):
    plain = _build(spark, f"{tmpdir_path}/plain")
    clustered = _build(spark, f"{tmpdir_path}/clustered")
    full_expected = _pdf(plain.read())

    assert plain.compact(max_files=0) > 0
    assert clustered.compact(max_files=0, cluster_files=4) > 0

    # identical full state either way
    assert_frames_equal(_pdf(plain.read()), full_expected)
    assert_frames_equal(_pdf(clustered.read()), full_expected)

    # clustered buckets hold up to 4 files tiling the time range
    n_plain = sum(len(f) for f in plain._snapshot["buckets"].values())
    n_clustered = sum(len(f) for f in clustered._snapshot["buckets"].values())
    assert n_plain == len(plain._snapshot["buckets"])
    assert n_clustered > n_plain
    # every clustered output file got footer stats in the manifest
    stats = clustered._snapshot["file_stats"]
    assert all(stats.get(f) for fs in clustered._snapshot["buckets"].values() for f in fs)

    # a last-day window prunes files on the clustered table, none on plain
    lo = _day(8)
    plain.last_read_pruned_files = 0
    clustered.last_read_pruned_files = 0
    expected = full_expected[full_expected.ts >= lo].reset_index(drop=True)
    got_plain = _pdf(plain.read(min_event_time=lo))
    got_clustered = _pdf(clustered.read(min_event_time=lo))
    assert_frames_equal(got_plain, expected)
    assert_frames_equal(got_clustered, expected)
    assert plain.last_read_pruned_files == 0
    assert clustered.last_read_pruned_files >= 4  # ≥1 sub-range file per bucket


def test_clustered_compact_equals_plain_under_deletes(spark, tmpdir_path):
    """Tombstones carry their own order tuple and land in time slices like
    any row; late stale re-deliveries still lose after a clustered rewrite."""
    tbl = _build(spark, f"{tmpdir_path}/t", n_days=4)
    # delete one day-2 conv, then cluster
    dele = spark.createDataFrame(
        [(900, "delete", "c2-1", 0, None, None, None, _day(6))], _COLS
    )
    apply_changes(tbl, dele, epoch_id=100)
    assert tbl.compact(max_files=0, cluster_files=3) > 0
    # stale re-delivery of the deleted row (old ts) must not resurrect it
    stale = spark.createDataFrame(
        [(901, "update", "c2-1", 0, "user", "stale", None, _day(2))], _COLS
    )
    apply_changes(tbl, stale, epoch_id=101)
    got = tbl.read().filter(F.col("conv_id") == "c2-1").count()
    assert got == 0


def test_auto_cluster_on_merge(spark, tmpdir_path):
    """apply_changes(auto_compact_files=…, auto_cluster_files=k) makes the
    post-commit maintenance rewrite clustered — steady-state ingest keeps
    the layout windowed-read-prunable without a separate clustering pass."""
    tbl = create_transcripts_table(
        spark, f"{tmpdir_path}/t", n_buckets=4, mode="mor"
    )
    for e in range(3):
        batch = spark.createDataFrame(_rows(day=e + 1, lsn0=100 * e), _COLS)
        apply_changes(
            tbl, batch, epoch_id=e, auto_compact_files=1, auto_cluster_files=3
        )
    buckets = tbl._snapshot["buckets"]
    assert all(1 < len(fs) <= 3 for fs in buckets.values())
    stats = tbl._snapshot["file_stats"]
    assert all(stats.get(f) for fs in buckets.values() for f in fs)
    tbl.last_read_pruned_files = 0
    got = _pdf(tbl.read(min_event_time=_day(3)))
    assert tbl.last_read_pruned_files >= 4
    assert set(got.conv_id) == {f"c3-{i}" for i in range(8)}


def test_maintain_one_call(spark, tmpdir_path):
    """maintain() chains clustered compaction, watermark-gated tombstone
    purge, lineage folding, and retention vacuum — content identical,
    history bounded, tombstones below the horizon gone."""
    tbl = _build(spark, f"{tmpdir_path}/t", n_days=4)
    apply_changes(
        tbl,
        spark.createDataFrame(
            [(900, "delete", "c2-1", 0, None, None, None, _day(5))], _COLS
        ),
        epoch_id=100,
    )
    before = _pdf(tbl.read())
    rep = tbl.maintain(
        max_files=0,
        cluster_files=3,
        changelog_retention_lsn=901,  # horizon above the delete's lsn
        retain_versions=1,
    )
    assert rep["compacted_buckets"] > 0
    assert rep["tombstones_purged"] == 1
    assert rep["files_vacuumed"] > 0
    assert_frames_equal(_pdf(tbl.read()), before)
    assert len(tbl.versions()) == 1
    # clustered layout survived the chain: >1 stats-carrying file per bucket
    buckets = tbl._snapshot["buckets"]
    assert any(len(fs) > 1 for fs in buckets.values())


def test_cluster_degrades_gracefully_without_stats(spark, tmpdir_path):
    """A bucket whose stats are unusable compacts to one file instead of
    failing (slice expr returns 0 for it)."""
    tbl = _build(spark, f"{tmpdir_path}/t", n_days=3)
    # sabotage the stats of one bucket's files
    some_bucket = next(iter(tbl._snapshot["buckets"]))
    for f in tbl._snapshot["buckets"][some_bucket]:
        tbl._snapshot["file_stats"][f] = None
    before = _pdf(tbl.read())
    assert tbl.compact(max_files=0, cluster_files=4) > 0
    assert_frames_equal(_pdf(tbl.read()), before)
    assert len(tbl._snapshot["buckets"][some_bucket]) == 1


def test_compact_bucket_filter(spark, tmpdir_path):
    """compact(buckets=[…]) — OPTIMIZE WHERE analog: only the selected
    overdue bucket rewrites; the other buckets keep their exact file
    lists."""
    tbl = _build(spark, tmpdir_path + "/t", n_days=4)
    over = sorted(
        int(b) for b, fs in tbl._snapshot["buckets"].items() if len(fs) > 1
    )
    assert len(over) >= 2  # needs at least two overdue buckets to matter
    target, untouched = over[0], over[1]
    before_untouched = list(tbl._snapshot["buckets"][str(untouched)])
    before = sorted(map(tuple, tbl.read().collect()))
    assert tbl.compact(max_files=1, buckets=[target]) == 1
    assert tbl._snapshot["buckets"][str(untouched)] == before_untouched
    assert len(tbl._snapshot["buckets"][str(target)]) == 1
    assert sorted(map(tuple, tbl.read().collect())) == before

"""Right-to-be-forgotten erasure: purge_key must remove every physical
trace of a key — live rows, superseded delta versions, tombstones, time
travel, and the changes feed — while leaving every other key bit-intact."""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import ConcurrentCommitError
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _seed(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=4, mode=mode)
    apply_changes(
        tbl,
        spark.createDataFrame(
            [
                (1, "insert", "gone", 0, "user", "v1", None, _t(1)),
                (2, "insert", "gone", 1, "user", "v1", None, _t(1)),
                (3, "insert", "kept", 0, "user", "k1", None, _t(1)),
            ],
            _COLS,
        ),
        0,
    )
    apply_changes(
        tbl,
        spark.createDataFrame(
            [
                (4, "update", "gone", 0, "user", "v2", None, _t(2)),  # supersedes
                (5, "delete", "gone", 1, None, None, None, _t(2)),  # tombstone
                (6, "insert", "kept", 1, "user", "k2", None, _t(2)),
            ],
            _COLS,
        ),
        1,
    )
    return tbl


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_purge_key_erases_every_trace(spark, tmpdir_path, mode):
    tbl = _seed(spark, f"{tmpdir_path}/{mode}", mode)
    before_kept = {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in tbl.read().collect()
        if r["conv_id"] == "kept"
    }
    # gone/0 live (v2), gone/1 tombstoned, plus superseded v1 under MoR
    raw = tbl._read_raw()
    assert raw.filter(raw["conv_id"] == "gone").count() >= 2

    n = tbl.purge_key("gone")
    assert n >= 2  # at least the live winner + the tombstone

    # live state: key gone, others bit-identical
    assert tbl.read().filter("conv_id = 'gone'").count() == 0
    after_kept = {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in tbl.read().collect()
    }
    assert after_kept == before_kept == {("kept", 0, "k1"), ("kept", 1, "k2")}

    # physical files: NO file under the table root contains the key
    raw2 = tbl._read_raw()
    assert raw2.filter(raw2["conv_id"] == "gone").count() == 0
    # time travel cannot resurrect it: superseded snapshots were expired
    assert tbl.versions() == [tbl._snapshot["version"]]

    # point lookup and epoch commits are unaffected
    assert tbl.lookup("kept", 0).count() == 1
    assert tbl.is_epoch_committed(0) and tbl.is_epoch_committed(1)

    # idempotent: second purge finds nothing
    assert tbl.purge_key("gone") == 0


def test_purge_single_turn_keeps_other_turns(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    n = tbl.purge_key("kept", 1)
    assert n == 1
    left = {(r["conv_id"], r["turn_idx"]) for r in tbl.read().collect()}
    assert ("kept", 1) not in left
    assert ("kept", 0) in left and ("gone", 0) in left


def test_purge_key_changes_feed_cannot_leak_silently(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    feed = tbl.read_changes(since_epoch=0)
    assert feed.filter("conv_id = 'gone'").count() > 0
    tbl.purge_key("gone")
    # the purged bucket's epoch delta files are gone; the feed must either
    # exclude the key or refuse the truncated range — never silently
    # include stale payloads
    try:
        feed2 = tbl.read_changes(since_epoch=0)
        assert feed2.filter("conv_id = 'gone'").count() == 0
    except FileNotFoundError:
        pass  # loud refusal is the documented alternative


def test_purge_without_expire_keeps_history_then_vacuum_drops_it(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    v_before = tbl._snapshot["version"]
    n = tbl.purge_key("gone", expire_history=False)
    assert n >= 2
    # current state clean, but time travel still reaches the old rows —
    # the documented Iceberg-like contract that expire/vacuum completes
    # erasure
    assert tbl.read().filter("conv_id = 'gone'").count() == 0
    old = tbl.at_version(v_before)
    assert old.read().filter("conv_id = 'gone'").count() > 0
    tbl.vacuum(retain_versions=1)
    raw = tbl._read_raw()
    assert raw.filter(raw["conv_id"] == "gone").count() == 0


def test_purge_key_raises_on_concurrent_bucket_rewrite(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    # a second handle compacts (rewrites buckets) between this handle's
    # read of the snapshot and its commit; simulate by capturing the stale
    # instance first
    from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable

    stale = SnapshotTable(spark, tbl.path)
    assert tbl.compact(max_files=1) > 0  # rewrites every multi-file bucket
    with pytest.raises(ConcurrentCommitError):
        stale.purge_key("gone")


def test_purge_key_validates_arity(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    with pytest.raises(ValueError):
        tbl.purge_key()
    with pytest.raises(ValueError):
        tbl.purge_key("a", 1, "too-many")

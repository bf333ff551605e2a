"""sync_replica — full-fidelity table replication off the changes feed.

Contracts pinned here: a synced replica reads value-identical to the
source (including deletes and mid-stream schema evolution); syncs are
incremental (only the pending range is read) and resumable (the cursor is
the replica's committed-epoch watermark); a repeated sync is a no-op; a
late stale update loses identically on both tables (tombstone watermarks
replicate); a vacuum-truncated feed fails loudly instead of silently
dropping epochs.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.replication import sync_replica

COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def _ins(lsn, conv, turn, text, s):
    return (lsn, "insert", conv, turn, "user", text, None, _t(s))


def _state(tbl) -> list:
    cols = [f.name for f in tbl.schema.fields]
    return sorted(tuple(r[c] for c in cols) for r in tbl.read().collect())


def _mk_pair(spark, base):
    src = create_transcripts_table(spark, base + "/src", n_buckets=4, mode="mor")
    rep = create_transcripts_table(spark, base + "/rep", n_buckets=4, mode="mor")
    return src, rep


def test_sync_replicates_state_deletes_and_evolution(spark, tmpdir_path):
    src, rep = _mk_pair(spark, tmpdir_path)
    apply_changes(src, spark.createDataFrame(
        [_ins(1, "c1", 0, "a", 1), _ins(2, "c2", 0, "b", 2)], COLS), 0)
    apply_changes(src, spark.createDataFrame(
        [(3, "delete", "c1", 0, None, None, None, _t(3))], COLS), 1)
    # epoch 2 evolves the schema additively
    cols_meta = COLS + ", metadata string"
    apply_changes(src, spark.createDataFrame(
        [(4, "insert", "c3", 0, "user", "c", None, _t(4), '{"x":1}')], cols_meta), 2)
    st = sync_replica(src, rep)
    assert st is not None and not st.was_noop
    assert _state(rep) == _state(src)
    assert "metadata" in [f.name for f in rep.schema.fields]
    # repeated sync: no pending range
    assert sync_replica(src, rep) is None


def test_sync_is_incremental_and_resumable(spark, tmpdir_path):
    src, rep = _mk_pair(spark, tmpdir_path)
    apply_changes(src, spark.createDataFrame([_ins(1, "c1", 0, "a", 1)], COLS), 0)
    apply_changes(src, spark.createDataFrame([_ins(2, "c2", 0, "b", 2)], COLS), 1)
    sync_replica(src, rep)
    assert rep.last_committed_epoch == 1
    # more source epochs; the next sync covers only [2, 3]
    apply_changes(src, spark.createDataFrame(
        [(3, "update", "c1", 0, "user", "a2", None, _t(5))], COLS), 2)
    apply_changes(src, spark.createDataFrame([_ins(4, "c4", 0, "d", 6)], COLS), 3)
    st = sync_replica(src, rep)
    assert rep.last_committed_epoch == 3
    assert _state(rep) == _state(src)
    # a crashed sync replays the same range and no-ops (exactly-once)
    again = sync_replica(src, rep, to_epoch=3)
    assert again is None or again.was_noop


def test_replicated_tombstone_defeats_stale_update(spark, tmpdir_path):
    src, rep = _mk_pair(spark, tmpdir_path)
    apply_changes(src, spark.createDataFrame([_ins(1, "c1", 0, "x", 5)], COLS), 0)
    apply_changes(src, spark.createDataFrame(
        [(2, "delete", "c1", 0, None, None, None, _t(9))], COLS), 1)
    sync_replica(src, rep)
    assert rep.read().count() == 0
    # a stale update (older ts than the delete) applied to BOTH tables
    stale = [(7, "update", "c1", 0, "user", "zombie", None, _t(7))]
    apply_changes(src, spark.createDataFrame(stale, COLS), 2)
    apply_changes(rep, spark.createDataFrame(stale, COLS), 2)
    assert src.read().count() == 0  # tombstone wins at the source...
    assert rep.read().count() == 0  # ...and identically on the replica


def test_truncated_feed_fails_loudly(spark, tmpdir_path):
    src, rep = _mk_pair(spark, tmpdir_path)
    for e in range(3):
        apply_changes(src, spark.createDataFrame(
            [_ins(e + 1, f"c{e}", 0, f"t{e}", e + 1)], COLS), e)
    src.compact(max_files=1)
    src.vacuum(retain_versions=1)  # folds + expires the per-epoch deltas
    with pytest.raises(FileNotFoundError):
        sync_replica(src, rep)
    # the documented recovery: re-seed from a full read, cursor catches up
    rep.bootstrap(src.read(), epoch_id=src.last_committed_epoch)
    assert _state(rep) == _state(src)
    assert sync_replica(src, rep) is None


def test_cow_source_refuses(spark, tmpdir_path):
    src = create_transcripts_table(spark, tmpdir_path + "/s", n_buckets=2, mode="cow")
    rep = create_transcripts_table(spark, tmpdir_path + "/r", n_buckets=2, mode="mor")
    with pytest.raises(ValueError):
        sync_replica(src, rep)


def test_run_stream_replica(spark, tmpdir_path):
    """Continuous replication through the table_changes stream source:
    an availableNow drain catches the replica up (deletes + evolution
    included), a second drain under the same checkpoint is a no-op, and a
    later source epoch flows through incrementally."""
    from mas_scada_bulkingest_spark.replication import run_stream_replica

    src, rep = _mk_pair(spark, tmpdir_path)
    apply_changes(src, spark.createDataFrame(
        [_ins(1, "c1", 0, "a", 1), _ins(2, "c2", 0, "b", 2)], COLS), 0)
    apply_changes(src, spark.createDataFrame(
        [(3, "delete", "c1", 0, None, None, None, _t(3))], COLS), 1)
    cols_meta = COLS + ", metadata string"
    apply_changes(src, spark.createDataFrame(
        [(4, "insert", "c3", 0, "user", "c", None, _t(4), '{"x":1}')], cols_meta), 2)

    ck = tmpdir_path + "/ck"
    q = run_stream_replica(spark, src.path, rep, ck)
    q.awaitTermination(120)
    assert _state(rep) == _state(src)
    assert "metadata" in [f.name for f in rep.schema.fields]
    assert rep.last_committed_epoch == 2

    # idle drain: offsets unchanged, no new replica commit
    n_before = rep.committed_epoch_count
    q = run_stream_replica(spark, src.path, rep, ck)
    q.awaitTermination(120)
    assert rep.committed_epoch_count == n_before

    # incremental tail: one more source epoch flows through
    apply_changes(src, spark.createDataFrame(
        [_ins(9, "c9", 1, "tail", 9)], COLS), 3)
    q = run_stream_replica(spark, src.path, rep, ck)
    q.awaitTermination(120)
    assert _state(rep) == _state(src)
    assert rep.last_committed_epoch == 3

    # fresh checkpoint over the already-current replica: sinceEpoch starts
    # at the cursor, nothing double-applies
    q = run_stream_replica(spark, src.path, rep, tmpdir_path + "/ck2")
    q.awaitTermination(120)
    assert _state(rep) == _state(src)
    assert rep.last_committed_epoch == 3

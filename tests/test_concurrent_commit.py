"""Optimistic-concurrency snapshot commits (VERDICT r3 Missing #3).

Two writers racing on the same parent version must not silently last-write-
win: the version-file hard-link CAS lets exactly one writer own each
version; a MoR loser rebases its append-only delta onto the winner's
snapshot and retries; a CoW loser raises; a winner that crashed between the
CAS and the pointer flip is helped forward by the next writer."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake import ConcurrentCommitError, SnapshotTable
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

from conftest import assert_frames_equal

CHANGE_DDL = ("lsn long, op string, conv_id string, turn_idx int, "
              "role string, text string, tool string, ts timestamp_ntz")


def _batch(spark, conv: str, lsn0: int, n: int = 3):
    t = datetime(2024, 1, 1)
    rows = [(lsn0 + i, "insert", conv, i, "user", f"{conv}-{i}", None, t)
            for i in range(n)]
    return spark.createDataFrame(rows, CHANGE_DDL)


def test_mor_concurrent_writers_lose_nothing(spark, tmpdir_path):
    """Writer A commits while writer B holds a stale in-memory snapshot; B's
    commit must CAS-fail, rebase its delta onto A's snapshot, and retry —
    BOTH epochs' rows and file lists survive (the old unconditional rename
    silently dropped one)."""
    path = tmpdir_path + "/t"
    create_transcripts_table(spark, path, n_buckets=4, mode="mor")
    a = SnapshotTable(spark, path)
    b = SnapshotTable(spark, path)  # loaded at the same parent version as a
    apply_changes(a, _batch(spark, "conv_a", 100), epoch_id=0)
    # b still believes the pre-A version: its commit must hit the CAS
    apply_changes(b, _batch(spark, "conv_b", 200), epoch_id=1)

    fresh = SnapshotTable(spark, path)
    assert fresh.is_epoch_committed(0) and fresh.is_epoch_committed(1)
    final = fresh.read().orderBy("conv_id", "turn_idx").toPandas()
    assert sorted(final.conv_id.unique()) == ["conv_a", "conv_b"]
    assert len(final) == 6  # nothing lost on either side
    # every data file of BOTH epochs is referenced in the final snapshot
    referenced = {f for v in fresh._snapshot["buckets"].values() for f in v}
    a_files = {f for v in a._snapshot["buckets"].values() for f in v}
    b_files = {f for v in b._snapshot["buckets"].values() for f in v}
    assert a_files <= referenced and b_files <= referenced


def test_same_epoch_duel_is_noop_for_loser(spark, tmpdir_path):
    """Two writers replaying the SAME epoch id: the CAS loser reloads, finds
    its epoch already committed, and returns a no-op instead of double-
    counting (exactly-once under concurrency)."""
    path = tmpdir_path + "/t"
    create_transcripts_table(spark, path, n_buckets=4, mode="mor")
    a = SnapshotTable(spark, path)
    b = SnapshotTable(spark, path)
    st_a = apply_changes(a, _batch(spark, "conv_x", 100), epoch_id=7)
    st_b = apply_changes(b, _batch(spark, "conv_x", 100), epoch_id=7)
    assert not st_a.was_noop and st_b.was_noop
    fresh = SnapshotTable(spark, path)
    assert len(fresh.read().toPandas()) == 3  # applied exactly once


def test_cow_concurrent_commit_raises(spark, tmpdir_path):
    """CoW rewrites are built against a specific file set — a conflicting
    commit must surface as ConcurrentCommitError, never silently rebase."""
    path = tmpdir_path + "/t"
    create_transcripts_table(spark, path, n_buckets=4, mode="cow")
    a = SnapshotTable(spark, path)
    b = SnapshotTable(spark, path)
    apply_changes(a, _batch(spark, "conv_a", 100), epoch_id=0)
    with pytest.raises(ConcurrentCommitError):
        apply_changes(b, _batch(spark, "conv_b", 200), epoch_id=1)
    # the loser's table is intact and retryable after reload
    b2 = SnapshotTable(spark, path)
    apply_changes(b2, _batch(spark, "conv_b", 200), epoch_id=1)
    fresh = SnapshotTable(spark, path)
    assert sorted(fresh.read().toPandas().conv_id.unique()) == ["conv_a", "conv_b"]


def test_orphaned_winner_is_helped_forward(spark, tmpdir_path):
    """A writer that crashed between the version CAS and the pointer flip
    leaves a fully-formed orphan vN.json; the next conflicting writer flips
    the pointer on its behalf (helping), reloads, and retries — the orphan's
    commit is preserved, the sequence never wedges."""
    path = tmpdir_path + "/t"
    create_transcripts_table(spark, path, n_buckets=4, mode="mor")
    a = SnapshotTable(spark, path)
    apply_changes(a, _batch(spark, "conv_a", 100), epoch_id=0)
    # handcraft the crashed winner: next version exists, pointer not flipped
    cur = a._snapshot
    orphan = {**cur, "version": cur["version"] + 1, "parent": cur["version"],
              "committed_epochs": sorted({*map(str, cur["committed_epochs"]), "99"})}
    with open(os.path.join(path, "snapshots", f"v{orphan['version']:08d}.json"), "w") as f:
        json.dump(orphan, f)
    # a's next commit CAS-fails, helps the orphan forward, rebases, retries
    apply_changes(a, _batch(spark, "conv_b", 200), epoch_id=1)
    fresh = SnapshotTable(spark, path)
    assert fresh.is_epoch_committed(99)  # the orphan's commit survived
    assert fresh.is_epoch_committed(0) and fresh.is_epoch_committed(1)
    assert sorted(fresh.read().toPandas().conv_id.unique()) == ["conv_a", "conv_b"]


def test_compaction_rebases_over_concurrent_append(spark, tmpdir_path):
    """Background compaction racing an ingest writer: the compactor loaded
    an older snapshot, so its commit CAS-fails; the rebase must swap ONLY
    its compacted input files for the compacted output while keeping the
    delta files the concurrent epoch appended — no data from either side
    lost (LWW is associative, so read-time collapse over output+new deltas
    yields identical winners)."""
    path = tmpdir_path + "/t"
    create_transcripts_table(spark, path, n_buckets=2, mode="mor")
    compactor = SnapshotTable(spark, path)
    writer = SnapshotTable(spark, path)
    # several epochs so buckets exceed the compaction threshold
    for e in range(4):
        apply_changes(compactor, _batch(spark, f"conv{e}", 100 * e, 4), epoch_id=e)
    writer._snapshot = writer._read_current_snapshot()
    compactor._snapshot = compactor._read_current_snapshot()
    # the ingest writer lands one more epoch AFTER the compactor's snapshot
    pre_compact_files = {
        f for v in compactor._snapshot["buckets"].values() for f in v
    }
    apply_changes(writer, _batch(spark, "conv_late", 900, 4), epoch_id=9)
    n = compactor.compact(max_files=1)
    assert n > 0  # rebase committed, not skipped
    fresh = SnapshotTable(spark, path)
    final = fresh.read().orderBy("conv_id", "turn_idx").toPandas()
    assert sorted(final.conv_id.unique()) == [
        "conv0", "conv1", "conv2", "conv3", "conv_late",
    ]
    assert len(final) == 20  # 5 convs x 4 turns, nothing lost
    # the concurrent epoch's delta files survived the rebase: every file
    # the writer's commit added (absent from the compactor's snapshot) is
    # still referenced
    ref_files = {f for v in fresh._snapshot["buckets"].values() for f in v}
    late_files = {
        f for v in writer._snapshot["buckets"].values() for f in v
    } - pre_compact_files
    assert late_files and late_files <= ref_files
    assert fresh.is_epoch_committed(9)

"""fast_forward(fork) — the Iceberg branch workflow composed from clone():
cut a zero-copy fork, land exactly-once epochs on it, publish the whole
branch back as one atomic commit. WAP generalized from one epoch to many.

Contracts pinned here: strict ancestry (source must be at the clone-point
version); adopted state is bit-identical to the fork; exactly-once composes
across the fork boundary (fork-committed epochs no-op on the source after
adoption); the changes feed serves fork epochs even when the fork's own
compaction folded their delta files; vacuum keeps adopted feed files alive
while the adopting snapshot is retained; schema evolution on the fork
carries back.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import (
    ConcurrentCommitError,
    SnapshotTable,
)
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def _ins(lsn, conv, turn, text, s):
    return (lsn, "insert", conv, turn, "user", text, None, _t(s))


def _state(tbl) -> list:
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in tbl.read().select("conv_id", "turn_idx", "text").collect()
    )


def _mk_src(spark, path, mode="mor"):
    tbl = create_transcripts_table(spark, path, n_buckets=4, mode=mode)
    apply_changes(tbl, spark.createDataFrame([_ins(1, "c0", 0, "base", 1)], COLS), 0)
    return tbl


def test_fast_forward_adopts_fork_commits(spark, tmpdir_path):
    src = _mk_src(spark, tmpdir_path + "/src")
    fork = src.clone(tmpdir_path + "/fork")
    apply_changes(fork, spark.createDataFrame([_ins(2, "c1", 0, "branch-a", 2)], COLS), 1)
    apply_changes(fork, spark.createDataFrame([_ins(3, "c2", 0, "branch-b", 3)], COLS), 2)
    v = src.fast_forward(fork)
    assert v == src._snapshot["version"]
    assert _state(src) == _state(fork)
    # exactly-once composes: fork-committed epochs no-op on the source now
    assert src.is_epoch_committed(1) and src.is_epoch_committed(2)
    again = apply_changes(
        src, spark.createDataFrame([_ins(2, "c1", 0, "branch-a", 2)], COLS), 1
    )
    assert again.was_noop
    # and the source keeps ingesting normally after the adoption
    apply_changes(src, spark.createDataFrame([_ins(4, "c3", 0, "post", 4)], COLS), 3)
    assert ("c3", 0, "post") in set(_state(src))


def test_fast_forward_refuses_after_source_moved(spark, tmpdir_path):
    src = _mk_src(spark, tmpdir_path + "/src")
    fork = src.clone(tmpdir_path + "/fork")
    apply_changes(fork, spark.createDataFrame([_ins(2, "c1", 0, "x", 2)], COLS), 1)
    apply_changes(src, spark.createDataFrame([_ins(3, "c2", 0, "moved", 3)], COLS), 5)
    with pytest.raises(ConcurrentCommitError):
        src.fast_forward(fork)


def test_fast_forward_refuses_non_fork(spark, tmpdir_path):
    src = _mk_src(spark, tmpdir_path + "/src")
    other = _mk_src(spark, tmpdir_path + "/other")
    with pytest.raises(ValueError):
        src.fast_forward(other)
    # and a fork of a DIFFERENT table is rejected too
    fork_of_other = other.clone(tmpdir_path + "/fork_of_other")
    with pytest.raises(ValueError):
        src.fast_forward(fork_of_other)


def test_feed_serves_fork_epochs_through_fork_compaction(spark, tmpdir_path):
    src = _mk_src(spark, tmpdir_path + "/src")
    fork = src.clone(tmpdir_path + "/fork")
    for e in (1, 2, 3):
        apply_changes(
            fork,
            spark.createDataFrame([_ins(e + 1, f"c{e}", 0, f"t{e}", e + 1)], COLS),
            e,
        )
    # fold the fork's per-epoch deltas into compacted base files
    assert fork.compact(max_files=1) > 0
    src.fast_forward(fork)
    # the source's feed serves the fork epochs from the adopted historical
    # deltas, even though no current bucket references them
    feed = src.read_changes(since_epoch=1, to_epoch=3)
    got = sorted((r["conv_id"], r["_change_epoch"]) for r in feed.collect())
    assert got == [("c1", 1), ("c2", 2), ("c3", 3)]
    # vacuum keeps the adopted files alive while their snapshot is retained
    src.vacuum(retain_versions=1)
    feed2 = src.read_changes(since_epoch=1, to_epoch=3)
    assert feed2.count() == 3


def test_fork_schema_evolution_carries_back(spark, tmpdir_path):
    src = _mk_src(spark, tmpdir_path + "/src")
    fork = src.clone(tmpdir_path + "/fork")
    cols_meta = COLS + ", metadata string"
    apply_changes(
        fork,
        spark.createDataFrame(
            [(2, "insert", "c9", 0, "user", "evolved", None, _t(2), '{"a":1}')],
            cols_meta,
        ),
        1,
    )
    src.fast_forward(fork)
    assert "metadata" in [f.name for f in src.schema.fields]
    row = src.lookup("c9").collect()[0]
    assert row["metadata"] == '{"a":1}'


def test_fast_forward_is_zero_data_file_open(spark, tmpdir_path, monkeypatch):
    import mas_scada_bulkingest_spark.lake.snapshot_table as st

    src = _mk_src(spark, tmpdir_path + "/src")
    fork = src.clone(tmpdir_path + "/fork")
    apply_changes(fork, spark.createDataFrame([_ins(2, "c1", 0, "x", 2)], COLS), 1)
    opened = []
    monkeypatch.setattr(st, "_file_order_stats", lambda *a: opened.append(a))
    monkeypatch.setattr(st, "_file_key_digest", lambda *a: opened.append(a))
    src.fast_forward(fork)
    assert opened == []

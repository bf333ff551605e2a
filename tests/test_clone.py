"""clone() — zero-copy (hard-link) table clone, the Delta/Iceberg CLONE
analog.

Contracts pinned here: the clone reads bit-identical to the source; the two
tables evolve independently after the fork; maintenance on the source
(vacuum / compact / purge_key) cannot damage the clone (links pin inodes);
committed epochs carry over (replays stay no-ops — the exactly-once handoff
invariant); the clone's history starts at its own v0, so read_changes below
the clone point raises instead of silently under-reporting.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _mk(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode=mode)
    rows0 = [
        (i, "update", f"c{i}", 0, "u", f"v{i}", None, datetime(2024, 1, 1, 0, 0, i))
        for i in range(12)
    ]
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", None, datetime(2024, 1, 1, 1)),
        (101, "delete", "c1", 0, None, None, None, datetime(2024, 1, 1, 1, 0, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), epoch_id=0)
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS), epoch_id=1)
    return tbl


def _state(tbl):
    return (
        tbl.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "text", "lsn"]]
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_clone_reads_equal_and_evolves_independently(spark, tmpdir_path, mode):
    src = _mk(spark, tmpdir_path + "/src", mode)
    before = _state(src)
    cl = src.clone(tmpdir_path + "/cl")
    assert _state(cl).equals(before)
    assert cl.versions() == [0] and cl.n_buckets == src.n_buckets
    assert cl.mode == src.mode

    # committed epochs carried over: replaying epoch 0 on the clone no-ops
    st = apply_changes(
        cl,
        spark.createDataFrame(
            [(0, "update", "cX", 0, "u", "x", None, datetime(2024, 1, 1))], _COLS
        ),
        epoch_id=0,
    )
    assert st.was_noop

    # a NEW epoch on the clone is invisible to the source, and vice versa
    apply_changes(
        cl,
        spark.createDataFrame(
            [(300, "update", "c2", 0, "u", "clone-only", None,
              datetime(2024, 1, 2))], _COLS
        ),
        epoch_id=5,
    )
    apply_changes(
        src,
        spark.createDataFrame(
            [(301, "update", "c3", 0, "u", "src-only", None,
              datetime(2024, 1, 2))], _COLS
        ),
        epoch_id=6,
    )
    cl_texts = set(_state(cl)["text"])
    src_texts = set(_state(src)["text"])
    assert "clone-only" in cl_texts and "clone-only" not in src_texts
    assert "src-only" in src_texts and "src-only" not in cl_texts


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_clone_survives_source_maintenance(spark, tmpdir_path, mode):
    src = _mk(spark, tmpdir_path + "/src", mode)
    before = _state(src)
    cl = src.clone(tmpdir_path + "/cl")
    # source maintenance unlinks directory entries; the clone's hard links
    # must keep every inode alive
    if mode == "mor":
        src.compact(max_files=1)
    apply_changes(
        src,
        spark.createDataFrame(
            [(400, "update", "c4", 0, "u", "post", None, datetime(2024, 1, 3))],
            _COLS,
        ),
        epoch_id=9,
    )
    src.vacuum()
    src.purge_key("c5")
    assert _state(cl).equals(before)
    rep = cl.verify_integrity()
    assert rep["ok"], rep


def test_clone_of_clone_and_dest_validation(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path + "/src", "mor")
    cl = src.clone(tmpdir_path + "/cl")
    cl2 = cl.clone(tmpdir_path + "/cl2")
    assert _state(cl2).equals(_state(src))
    with pytest.raises(ValueError, match="already exists"):
        src.clone(tmpdir_path + "/cl")


def test_clone_changes_feed_floor(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path + "/src", "mor")
    cl = src.clone(tmpdir_path + "/cl")
    # pre-clone epochs: the source serves them, the clone refuses loudly
    assert src.read_changes(0).count() > 0
    with pytest.raises(FileNotFoundError, match="starts at epoch 2"):
        cl.read_changes(0)
    with pytest.raises(FileNotFoundError):
        cl.read_changes(2, change_types=True)  # typed needs epoch-0 history
    # post-clone epochs flow normally
    apply_changes(
        cl,
        spark.createDataFrame(
            [(500, "update", "c6", 0, "u", "new", None, datetime(2024, 1, 4))],
            _COLS,
        ),
        epoch_id=2,
    )
    feed = cl.read_changes(2).toPandas()
    assert list(feed["text"]) == ["new"]


def test_clone_preserves_data_skipping_stats(spark, tmpdir_path):
    src = _mk(spark, tmpdir_path + "/src", "mor")
    cl = src.clone(tmpdir_path + "/cl")
    cl.last_read_pruned_files = 0
    got = cl.read(min_event_time="2024-06-01").count()
    assert got == 0 and cl.last_read_pruned_files > 0  # stats carried over


def test_clone_and_restore_open_zero_data_files(spark, tmpdir_path, monkeypatch):
    """The O(files)-metadata promise: clone() and restore() rebuild their
    manifest (sizes, [min,max] stats, key digests) ENTIRELY from the prior
    snapshot's carry-forward — at 100 TB neither may touch a data file."""
    import mas_scada_bulkingest_spark.lake.snapshot_table as st

    tbl = _mk(spark, tmpdir_path + "/src", "mor")
    v_before = tbl._snapshot["version"]

    opened = []
    real_stats, real_digest = st._file_order_stats, st._file_key_digest
    monkeypatch.setattr(
        st, "_file_order_stats", lambda *a: opened.append(a) or real_stats(*a)
    )
    monkeypatch.setattr(
        st, "_file_key_digest", lambda *a: opened.append(a) or real_digest(*a)
    )

    clone = tbl.clone(tmpdir_path + "/clone")
    assert clone.read().count() == tbl.read().count()
    tbl.restore(v_before)
    assert opened == []

"""read_changes — the incremental changes feed (Delta-CDF analog).

The engine both APPLIES a change stream and EMITS one: MoR epoch commits
append immutable per-epoch delta files, so the feed is a pure file-list
operation collected across the snapshot HISTORY (compaction folds deltas
out of the current snapshot but cannot hide an epoch); vacuum bounds
retention and a truncated range fails loudly.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _apply(spark, tbl, epoch, rows):
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=epoch)


def _mk(spark, path, n_epochs=3, **kw):
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode="mor")
    for e in range(n_epochs):
        rows = [
            (10 * e + i, "update", f"c{i}", 0, "u", f"e{e}-{i}", None,
             datetime(2024, 1, 1, e, 0, i))
            for i in range(4)
        ]
        if e == n_epochs - 1:
            rows.append((10 * e + 9, "delete", "c0", 0, None, None, None,
                         datetime(2024, 1, 1, e, 30)))
        _apply(spark, tbl, e, rows)
    return tbl


def test_feed_returns_per_epoch_winners(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t")
    feed = tbl.read_changes(since_epoch=1).toPandas()
    assert set(feed["_change_epoch"]) == {1, 2}
    # per-(key, epoch) WINNERS: the epoch-2 delete of c0 collapses with
    # that key's own epoch-2 update (delete is later) -> 4 rows per epoch
    assert len(feed) == 4 + 4
    dels = feed[feed["_change_type"] == "delete"]
    assert dels["conv_id"].tolist() == ["c0"] and dels["text"].isna().all()
    # range selection: a single epoch
    only1 = tbl.read_changes(since_epoch=1, to_epoch=1).toPandas()
    assert set(only1["text"]) == {f"e1-{i}" for i in range(4)}


def test_feed_survives_compaction(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t")
    before = tbl.read_changes(since_epoch=0).orderBy("lsn").toPandas()
    assert tbl.compact(max_files=1) > 0
    after = tbl.read_changes(since_epoch=0).orderBy("lsn").toPandas()
    # compaction folded deltas out of the CURRENT snapshot, but the feed
    # walks history — identical content
    assert before.equals(after)


def test_commits_record_added_files_delta(spark, tmpdir_path):
    """Each snapshot carries its per-commit file delta (manifest-list
    analog) so history walks stay O(files added) per snapshot."""
    tbl = _mk(spark, tmpdir_path + "/t")
    snap = tbl._snapshot
    assert "added_files" in snap
    all_files = {f for fs in snap["buckets"].values() for f in fs}
    assert set(snap["added_files"]) <= all_files
    # the latest commit's delta: only its own epoch's files
    assert all("epoch=2-" in f for f in snap["added_files"])
    # feed built from the per-commit deltas still sees every epoch:
    # 4 per-(key, epoch) winners x 3 epochs (the epoch-2 delete collapses
    # with its key's own update)
    assert tbl.read_changes(since_epoch=0).count() == 12


def test_feed_truncated_by_vacuum_raises(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t")
    tbl.compact(max_files=1)
    tbl.vacuum(retain_versions=1)  # deletes the compacted-away delta files
    with pytest.raises(FileNotFoundError, match="truncated by vacuum"):
        tbl.read_changes(since_epoch=0).count()


def test_feed_rejects_cow(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="cow")
    _apply(spark, tbl, 0, [(1, "update", "c", 0, "u", "x", None,
                            datetime(2024, 1, 1))])
    with pytest.raises(ValueError, match="merge-on-read"):
        tbl.read_changes(since_epoch=0)


def test_feed_empty_range(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t")
    out = tbl.read_changes(since_epoch=99)
    assert out.count() == 0
    assert "_change_type" in out.columns and "_change_epoch" in out.columns


def test_feed_carries_evolved_columns(spark, tmpdir_path):
    """Additive evolution mid-stream: pre-evolution epochs read NULL for
    the new column; post-evolution epochs carry it."""
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    _apply(spark, tbl, 0, [(1, "update", "a", 0, "u", "v1", None,
                            datetime(2024, 1, 1))])
    cols2 = _COLS + ", metadata string"
    batch = spark.createDataFrame(
        [(2, "update", "a", 1, "u", "v2", None, datetime(2024, 1, 1, 1), "{}")], cols2
    )
    apply_changes(tbl, batch, epoch_id=1)
    feed = tbl.read_changes(since_epoch=0).orderBy("lsn").toPandas()
    assert feed["metadata"].tolist()[0] is None or feed["metadata"].isna()[0]
    assert feed["metadata"].tolist()[1] == "{}"


def test_feed_projection(spark, tmpdir_path):
    """read_changes(columns=…) prunes the delta scan like read(columns=…):
    output = key ∪ requested + feed columns, values identical to the full
    feed's projection; columns=[] serves keys only (the derived-refresh
    affected-key probe); typed feed classifies identically with the order
    columns carried internally and dropped from the output."""
    import pandas as pd

    tbl = _mk(spark, tmpdir_path + "/t")
    full = tbl.read_changes(0).toPandas()
    proj = tbl.read_changes(0, columns=["text"]).toPandas()
    assert sorted(proj.columns) == sorted(
        ["conv_id", "turn_idx", "text", "_change_type", "_change_epoch"]
    )
    key = ["_change_epoch", "conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        proj.sort_values(key).reset_index(drop=True),
        full[proj.columns].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    keys_only = tbl.read_changes(0, columns=[]).toPandas()
    assert sorted(keys_only.columns) == sorted(
        ["conv_id", "turn_idx", "_change_type", "_change_epoch"]
    )
    assert len(keys_only) == len(full)
    # typed feed under projection == typed feed projected
    t_full = tbl.read_changes(0, change_types=True).toPandas()
    t_proj = tbl.read_changes(0, change_types=True, columns=[]).toPandas()
    pd.testing.assert_frame_equal(
        t_proj.sort_values(key).reset_index(drop=True),
        t_full[t_proj.columns].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    with pytest.raises(ValueError, match="unknown column"):
        tbl.read_changes(0, columns=["nope"])

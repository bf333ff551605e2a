"""Cascading CDC: persisted derived rollup maintained off the changes feed.

Contracts pinned here: incremental refresh ≡ from-scratch recompute for any
split of the epoch range; the derived table's own epoch log is the resume
cursor (replayed refreshes no-op); fully-deleted conversations tombstone
out; and — the regression that motivates the refresh-epoch LWW order —
deleting the turn that held a conversation's max (ts, lsn) must not let
the stale rollup win.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.derived import (
    create_conversation_rollup,
    rebuild_rollup,
    refresh_rollup,
    rollup_state,
)
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _apply(spark, tbl, rows, epoch):
    return apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=epoch)


def _derived_state(derived):
    return (
        derived.read()
        .select("conv_id", "live_turns", "total_chars", "last_ts", "max_lsn")
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )


def _recompute(source):
    return (
        rollup_state(source.read())
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.fixture()
def source(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/src", n_buckets=4, mode="mor"
    )
    _apply(
        spark,
        tbl,
        [
            (i, "update", f"c{i % 3}", i // 3, "u", "x" * (i + 1), None,
             datetime(2024, 1, 1, 0, 0, i))
            for i in range(9)
        ],
        0,
    )
    _apply(
        spark,
        tbl,
        [
            (20, "update", "c0", 0, "u", "longer text", None,
             datetime(2024, 1, 2)),
            (21, "delete", "c1", 1, None, None, None, datetime(2024, 1, 2, 1)),
        ],
        1,
    )
    return tbl


def test_incremental_equals_recompute_any_split(spark, tmpdir_path, source):
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    # split the range: epoch 0 first, then the rest
    st1 = refresh_rollup(source, derived, to_epoch=0)
    assert st1 is not None and not st1.was_noop
    mid = _derived_state(derived)
    assert set(mid["conv_id"]) == {"c0", "c1", "c2"}
    st2 = refresh_rollup(source, derived)
    assert st2 is not None and not st2.was_noop
    final = _derived_state(derived)
    ref = _recompute(source)
    assert final.equals(ref), f"\n{final}\nvs\n{ref}"
    # caught up: another refresh is None; a replayed range no-ops
    assert refresh_rollup(source, derived) is None
    assert derived.last_committed_epoch == source.last_committed_epoch


def test_single_shot_equals_split(spark, tmpdir_path, source):
    d1 = create_conversation_rollup(spark, tmpdir_path + "/d1")
    refresh_rollup(source, d1)  # one refresh over the whole range
    d2 = create_conversation_rollup(spark, tmpdir_path + "/d2")
    refresh_rollup(source, d2, to_epoch=0)
    refresh_rollup(source, d2)
    assert _derived_state(d1).equals(_derived_state(d2))


def test_fully_deleted_conversation_tombstones_out(spark, tmpdir_path, source):
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    refresh_rollup(source, derived)
    assert "c2" in set(_derived_state(derived)["conv_id"])
    _apply(
        spark,
        source,
        [
            (30 + t, "delete", "c2", t, None, None, None,
             datetime(2024, 1, 3, 0, t))
            for t in range(3)
        ],
        2,
    )
    refresh_rollup(source, derived)
    final = _derived_state(derived)
    assert "c2" not in set(final["conv_id"])
    assert final.equals(_recompute(source))


def test_rebuild_when_feed_truncated(spark, tmpdir_path, source):
    # derived never refreshed; source history compacted + vacuumed so the
    # incremental feed for the pending range is gone
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    source.compact(max_files=1)
    source.vacuum()
    with pytest.raises(FileNotFoundError):
        refresh_rollup(source, derived)
    st = rebuild_rollup(source, derived)
    assert st is not None and not st.was_noop
    assert _derived_state(derived).equals(_recompute(source))
    # cursor caught up: rebuild again is None, and a NEW source epoch
    # resumes incrementally
    assert rebuild_rollup(source, derived) is None
    _apply(
        spark,
        source,
        [(50, "update", "c1", 0, "u", "post-rebuild", None,
          datetime(2024, 1, 5))],
        2,
    )
    st2 = refresh_rollup(source, derived)
    assert st2 is not None and not st2.was_noop
    assert _derived_state(derived).equals(_recompute(source))


def test_rebuild_tombstones_vanished_conversations(spark, tmpdir_path, source):
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    refresh_rollup(source, derived)
    assert "c2" in set(_derived_state(derived)["conv_id"])
    # c2 fully deleted in epoch 2, then the feed range is truncated
    _apply(
        spark,
        source,
        [(30 + t, "delete", "c2", t, None, None, None,
          datetime(2024, 1, 3, 0, t)) for t in range(3)],
        2,
    )
    source.compact(max_files=1)
    source.vacuum()
    st = rebuild_rollup(source, derived)
    assert st is not None
    final = _derived_state(derived)
    assert "c2" not in set(final["conv_id"])
    assert final.equals(_recompute(source))


def test_generic_refresh_with_index_aggregate(spark, tmpdir_path, source):
    # the machinery is aggregate-generic: the latest-turn serving index
    # maintained incrementally equals its from-scratch recompute
    from mas_scada_bulkingest_spark.derived import (
        create_conversation_index,
        index_state,
        refresh_derived,
    )

    idx = create_conversation_index(spark, tmpdir_path + "/i")
    refresh_derived(source, idx, index_state, to_epoch=0)
    refresh_derived(source, idx, index_state)
    got = (
        idx.read()
        .select("conv_id", "last_turn_idx", "last_role", "last_text")
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    ref = (
        index_state(source.read())
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert got.equals(ref), f"\n{got}\nvs\n{ref}"
    assert refresh_derived(source, idx, index_state) is None


_STATE_COLS = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp_ntz, lsn long"
)


def test_bootstrap_state_must_be_absorbed_by_rebuild(spark, tmpdir_path):
    # bootstrap commits a non-numeric epoch and writes files the changes
    # feed never serves — refresh must refuse (not silently skip), rebuild
    # absorbs it and records the cover marker, then incremental resumes
    tbl = create_transcripts_table(spark, tmpdir_path + "/src",
                                   n_buckets=4, mode="mor")
    state = spark.createDataFrame(
        [(f"b{i}", 0, "u", f"boot{i}", None, datetime(2024, 1, 1), i)
         for i in range(5)],
        _STATE_COLS,
    )
    tbl.bootstrap(state, epoch_id="bootstrap-0")
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")

    with pytest.raises(FileNotFoundError, match="bootstrap"):
        refresh_rollup(tbl, derived)
    st = rebuild_rollup(tbl, derived)
    assert st is not None and not st.was_noop
    assert _derived_state(derived).equals(_recompute(tbl))
    assert rebuild_rollup(tbl, derived) is None  # idempotent
    assert refresh_rollup(tbl, derived) is None  # covered + caught up

    # incremental resumes over the bootstrap-loaded baseline
    _apply(
        spark, tbl,
        [(100, "update", "b0", 0, "u", "changed", None, datetime(2024, 1, 2))],
        0,
    )
    st2 = refresh_rollup(tbl, derived)
    assert st2 is not None and not st2.was_noop
    assert _derived_state(derived).equals(_recompute(tbl))


def test_bootstrap_plus_change_epochs_before_first_rebuild(spark, tmpdir_path):
    # content goes in under the numeric epoch AND the cover marker is
    # recorded (two commits) — refresh stops refusing afterwards
    tbl = create_transcripts_table(spark, tmpdir_path + "/src",
                                   n_buckets=4, mode="mor")
    tbl.bootstrap(
        spark.createDataFrame(
            [(f"b{i}", 0, "u", f"boot{i}", None, datetime(2024, 1, 1), i)
             for i in range(4)],
            _STATE_COLS,
        ),
        epoch_id="bootstrap-0",
    )
    _apply(
        spark, tbl,
        [(50, "update", "b1", 1, "u", "turn2", None, datetime(2024, 1, 2))],
        0,
    )
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    with pytest.raises(FileNotFoundError, match="bootstrap"):
        refresh_rollup(tbl, derived)
    rebuild_rollup(tbl, derived)
    assert _derived_state(derived).equals(_recompute(tbl))
    assert derived.last_committed_epoch == 0  # numeric cursor caught up
    assert refresh_rollup(tbl, derived) is None  # cover marker recorded


def test_refresh_raises_when_source_restored_below_cursor(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/src",
                                   n_buckets=2, mode="mor")
    _apply(spark, tbl,
           [(1, "update", "c0", 0, "u", "a", None, datetime(2024, 1, 1))], 0)
    v_e0 = tbl._snapshot["version"]
    _apply(spark, tbl,
           [(2, "update", "c1", 0, "u", "b", None, datetime(2024, 1, 2))], 1)
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    refresh_rollup(tbl, derived)  # cursor at 1

    tbl.restore(v_e0)  # source cursor back to 0
    with pytest.raises(ValueError, match="backwards"):
        refresh_rollup(tbl, derived)
    # the documented remedy: a fresh derived table rebuilt from state
    d2 = create_conversation_rollup(spark, tmpdir_path + "/d2")
    rebuild_rollup(tbl, d2)
    assert _derived_state(d2).equals(_recompute(tbl))


def test_streaming_cascade_keeps_rollup_fresh(spark, tmpdir_path):
    # rollup maintained INSIDE the micro-batch loop: after the availableNow
    # drain (multiple micro-batches), the derived table equals the full
    # recompute with no explicit post-run refresh
    from mas_scada_bulkingest_spark.sources import generate_changelog
    from mas_scada_bulkingest_spark.streaming import run_stream

    d = tmpdir_path
    generate_changelog(d + "/log", n_convs=40, mean_turns=4, seed=5)
    tbl = create_transcripts_table(spark, d + "/t", n_buckets=4, mode="mor")
    q = run_stream(
        spark, d + "/log", d + "/t", d + "/ckpt",
        max_files_per_trigger=2, available_now=True, rollup_path=d + "/r",
    )
    q.awaitTermination()
    from mas_scada_bulkingest_spark.derived import create_conversation_rollup

    from mas_scada_bulkingest_spark.lake import SnapshotTable

    tbl = SnapshotTable(spark, d + "/t")  # reload: the stream's own handle committed
    derived = create_conversation_rollup(spark, d + "/r")  # open-existing
    assert derived.committed_epoch_count > 1  # refreshed per batch, not once
    assert _derived_state(derived).equals(_recompute(tbl))
    # restart on a drained log: no new batches, rollup unchanged
    st = refresh_rollup(tbl, derived)
    assert st is None


def test_max_lsn_regression_stale_rollup_must_not_win(spark, tmpdir_path, source):
    # delete the turn holding c0's max lsn (20): the recomputed aggregate's
    # (ts, lsn) go BACKWARDS vs the previous rollup row — only the
    # refresh-epoch LWW order keeps the new row the winner
    derived = create_conversation_rollup(spark, tmpdir_path + "/d")
    refresh_rollup(source, derived)
    before = _derived_state(derived)
    assert int(before[before["conv_id"] == "c0"]["max_lsn"].iloc[0]) == 20
    _apply(
        spark,
        source,
        [(40, "delete", "c0", 0, None, None, None, datetime(2024, 1, 4))],
        2,
    )
    refresh_rollup(source, derived)
    final = _derived_state(derived)
    assert int(final[final["conv_id"] == "c0"]["max_lsn"].iloc[0]) < 20
    assert final.equals(_recompute(source))

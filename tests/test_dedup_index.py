"""Incremental MinHash-LSH near-dup index maintained off the changes feed
(``derived.lsh_index_state`` through the generic ``refresh_derived``).

Contracts pinned here: incremental refresh ≡ from-scratch recompute of the
index for any refresh split; editing ONE turn re-indexes only that
conversation (bands actually change); textually identical conversations
share all band keys (the candidate-pair property LSH dedup joins on);
fully-deleted conversations tombstone out of the index; conversations too
short to shingle carry NULL bands and n_shingles = 0.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from mas_scada_bulkingest_spark.derived import (
    create_dedup_index,
    lsh_index_state,
    rebuild_derived,
    refresh_derived,
)
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)

_BANDS = ["band_0", "band_1", "band_2", "band_3"]


def _apply(spark, tbl, rows, epoch):
    return apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=epoch)


def _idx_state(idx):
    return (
        idx.read()
        .select("conv_id", "n_shingles", *_BANDS)
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )


def _recompute(source):
    return (
        lsh_index_state(source.read())
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.fixture()
def source(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/src", n_buckets=4, mode="mor"
    )
    # twin conversations with identical multi-turn text, one distinct
    # conversation, and one too short to shingle
    _apply(
        spark,
        tbl,
        [
            (0, "update", "twin-a", 0, "u", "the quick brown fox jumps", None,
             datetime(2024, 1, 1, 0, 0, 0)),
            (1, "update", "twin-a", 1, "a", "over the lazy dog today", None,
             datetime(2024, 1, 1, 0, 0, 1)),
            (2, "update", "twin-b", 0, "u", "the quick brown fox jumps", None,
             datetime(2024, 1, 1, 0, 0, 2)),
            (3, "update", "twin-b", 1, "a", "over the lazy dog today", None,
             datetime(2024, 1, 1, 0, 0, 3)),
            (4, "update", "other", 0, "u", "completely different words here",
             None, datetime(2024, 1, 1, 0, 0, 4)),
            (5, "update", "tiny", 0, "u", "hi there", None,
             datetime(2024, 1, 1, 0, 0, 5)),
        ],
        0,
    )
    return tbl


def test_incremental_equals_recompute_and_twins_collide(
    spark, source, tmpdir_path
):
    idx = create_dedup_index(spark, tmpdir_path + "/idx", n_buckets=4)
    refresh_derived(source, idx, lsh_index_state)
    got = _idx_state(idx)
    pd.testing.assert_frame_equal(got, _recompute(source), check_dtype=False)

    rows = got.set_index("conv_id")
    # identical text → identical band keys on every band (LSH candidate pair)
    for b in _BANDS:
        assert rows.loc["twin-a", b] == rows.loc["twin-b", b]
        assert rows.loc["twin-a", b] != rows.loc["other", b]
    # too short to shingle → no bands, zero shingles
    assert rows.loc["tiny", "n_shingles"] == 0
    assert rows.loc["tiny", _BANDS].isna().all()
    assert rows.loc["twin-a", "n_shingles"] > 0


def test_edit_reindexes_only_changed_conversation(spark, source, tmpdir_path):
    idx = create_dedup_index(spark, tmpdir_path + "/idx", n_buckets=4)
    refresh_derived(source, idx, lsh_index_state)
    before = _idx_state(idx).set_index("conv_id")

    # edit one twin's second turn — it stops colliding with its sibling
    _apply(
        spark,
        source,
        [(10, "update", "twin-b", 1, "a", "under the energetic cat tomorrow",
          None, datetime(2024, 1, 2))],
        1,
    )
    st = refresh_derived(source, idx, lsh_index_state)
    assert st is not None and st.applied >= 1
    after = _idx_state(idx).set_index("conv_id")

    assert not (after.loc["twin-b", _BANDS] == before.loc["twin-b", _BANDS]).all()
    # untouched conversations keep byte-identical index rows
    for cid in ("twin-a", "other", "tiny"):
        assert (
            after.loc[cid].fillna("∅") == before.loc[cid].fillna("∅")
        ).all()
    # and the incremental result still equals the from-scratch recompute
    pd.testing.assert_frame_equal(
        _idx_state(idx), _recompute(source), check_dtype=False
    )


def test_stream_cascades_index_and_rollup(spark, tmpdir_path):
    """run_stream(derived_tables=[(index, lsh_index_state)]) keeps the LSH
    index fresh inside the micro-batch loop, alongside rollup_path — the
    generalized cascade."""
    from mas_scada_bulkingest_spark.derived import (
        create_conversation_rollup,
        rollup_state,
    )
    from mas_scada_bulkingest_spark.lake import SnapshotTable
    from mas_scada_bulkingest_spark.sources import generate_changelog
    from mas_scada_bulkingest_spark.streaming import run_stream

    d = tmpdir_path
    generate_changelog(d + "/log", n_convs=40, mean_turns=4, seed=5)
    create_transcripts_table(spark, d + "/t", n_buckets=4, mode="mor")
    idx = create_dedup_index(spark, d + "/idx", n_buckets=4)
    q = run_stream(
        spark, d + "/log", d + "/t", d + "/ckpt",
        max_files_per_trigger=2, available_now=True,
        rollup_path=d + "/r",
        derived_tables=[(idx, lsh_index_state)],
    )
    q.awaitTermination()
    src = SnapshotTable(spark, d + "/t")
    idx = create_dedup_index(spark, d + "/idx", n_buckets=4)  # open-existing
    assert idx.committed_epoch_count > 1  # refreshed per batch, not once
    pd.testing.assert_frame_equal(
        _idx_state(idx), _recompute(src), check_dtype=False
    )
    rollup = create_conversation_rollup(spark, d + "/r")
    got = (
        rollup.read()
        .select("conv_id", "live_turns")
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = (
        rollup_state(src.read())
        .select("conv_id", "live_turns")
        .orderBy("conv_id")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_split_refresh_equals_rebuild_and_delete_tombstones(
    spark, source, tmpdir_path
):
    # epoch 1: delete every turn of 'other'; epoch 2: extend twin-a
    _apply(
        spark,
        source,
        [(20, "delete", "other", 0, None, None, None, datetime(2024, 1, 2))],
        1,
    )
    _apply(
        spark,
        source,
        [(21, "update", "twin-a", 2, "u", "and some brand new words", None,
          datetime(2024, 1, 3))],
        2,
    )

    split = create_dedup_index(spark, tmpdir_path + "/split", n_buckets=4)
    refresh_derived(source, split, lsh_index_state, to_epoch=0)
    refresh_derived(source, split, lsh_index_state, to_epoch=1)
    refresh_derived(source, split, lsh_index_state)

    oneshot = create_dedup_index(spark, tmpdir_path + "/oneshot", n_buckets=4)
    rebuild_derived(source, oneshot, lsh_index_state)

    s, o = _idx_state(split), _idx_state(oneshot)
    pd.testing.assert_frame_equal(s, o, check_dtype=False)
    assert "other" not in set(s.conv_id)  # fully-deleted conv left the index
    pd.testing.assert_frame_equal(s, _recompute(source), check_dtype=False)

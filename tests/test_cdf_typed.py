"""Typed state-transition feed (read_changes(change_types=True)) and the
incremental-view-maintenance fold built on it.

MoR appends epochs blind, so insert/update/delete types are reconstructed
lazily from the feed itself: a windowed prefix-max of the (ts, lsn) order
tuple per key decides whether each epoch's batch winner transitioned state
and what it replaced. Stale winners and deletes of absent keys must emit
NOTHING (Delta-CDF contract), and folding the typed feed (+1/-1/0) must
reproduce the table's live state counts exactly.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _mk_scenario(spark, path):
    """Five epochs exercising every transition class (LWW order (ts, lsn)):

    key a: e0 upsert (INSERT) -> e1 later-ts upsert (UPDATE) -> e2 upsert
      with ts BETWEEN e0 and e1 (stale, nothing) -> e3 delete (DELETE) ->
      e4 upsert (re-INSERT)
    key b: e0 delete of a never-written key (nothing) -> e1 upsert (INSERT)
    key c: e0 upsert (INSERT) -> e1 delete with EARLIER ts (stale delete,
      nothing; state stays live)
    """
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode="mor")
    epochs = [
        [
            (1, "update", "a", 0, "u", "a-v0", None, datetime(2024, 1, 1, 1)),
            (2, "delete", "b", 0, None, None, None, datetime(2024, 1, 1, 1)),
            (3, "update", "c", 0, "u", "c-v0", None, datetime(2024, 1, 1, 1)),
        ],
        [
            (11, "update", "a", 0, "u", "a-v1", None, datetime(2024, 1, 1, 2)),
            (12, "update", "b", 0, "u", "b-v1", None, datetime(2024, 1, 1, 2)),
            (13, "delete", "c", 0, None, None, None, datetime(2024, 1, 1, 0, 30)),
        ],
        [(21, "update", "a", 0, "u", "a-v2", None, datetime(2024, 1, 1, 1, 30))],
        [(31, "delete", "a", 0, None, None, None, datetime(2024, 1, 1, 3))],
        [(41, "update", "a", 0, "u", "a-v4", None, datetime(2024, 1, 1, 4))],
    ]
    for e, rows in enumerate(epochs):
        apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=e)
    return tbl


def test_typed_feed_classifies_every_transition(spark, tmpdir_path):
    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    feed = (
        tbl.read_changes(since_epoch=0, change_types=True)
        .orderBy("conv_id", "_change_epoch")
        .toPandas()
    )
    got = list(
        zip(feed["conv_id"], feed["_change_epoch"], feed["_change_type"])
    )
    assert got == [
        ("a", 0, "insert"),
        ("a", 1, "update"),
        ("a", 3, "delete"),
        ("a", 4, "insert"),  # re-insert after delete
        ("b", 1, "insert"),  # b's e0 delete-of-absent emitted nothing
        ("c", 0, "insert"),  # c's e1 stale delete emitted nothing
    ]
    # payloads ride along; deletes carry the tombstone watermark, NULL text
    by = {(r["conv_id"], r["_change_epoch"]): r for _, r in feed.iterrows()}
    assert by[("a", 1)]["text"] == "a-v1"
    assert by[("a", 3)]["lsn"] == 31 and by[("a", 3)]["text"] is None


def test_typed_feed_range_filter_keeps_full_history_context(spark, tmpdir_path):
    """since_epoch slices the OUTPUT, not the classification window: the
    epoch-3 delete is still typed against epoch-1 state."""
    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    feed = (
        tbl.read_changes(since_epoch=3, change_types=True)
        .orderBy("_change_epoch")
        .toPandas()
    )
    assert list(zip(feed["_change_epoch"], feed["_change_type"])) == [
        (3, "delete"),
        (4, "insert"),
    ]


def test_ivm_fold_matches_state_recompute(spark, tmpdir_path):
    """Folding the typed feed (+1 insert / -1 delete / 0 update) per
    conversation equals counting live keys in read() — the IVM property."""
    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    feed = tbl.read_changes(since_epoch=0, change_types=True)
    delta = (
        F.when(F.col("_change_type") == "insert", F.lit(1))
        .when(F.col("_change_type") == "delete", F.lit(-1))
        .otherwise(F.lit(0))
    )
    fold = {
        r["conv_id"]: r["n"]
        for r in feed.groupBy("conv_id").agg(F.sum(delta).alias("n")).collect()
    }
    state = {
        r["conv_id"]: r["n"]
        for r in tbl.read().groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert fold == state == {"a": 1, "b": 1, "c": 1}


def test_typed_feed_survives_compaction(spark, tmpdir_path):
    """Compaction folds deltas out of the current snapshot; the typed feed
    walks history, so classification is unchanged."""
    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    before = (
        tbl.read_changes(since_epoch=0, change_types=True)
        .orderBy("conv_id", "_change_epoch")
        .toPandas()
    )
    assert tbl.compact(max_files=1) > 0
    after = (
        tbl.read_changes(since_epoch=0, change_types=True)
        .orderBy("conv_id", "_change_epoch")
        .toPandas()
    )
    assert before.equals(after)


def test_preimages_full_cdf_vocabulary(spark, tmpdir_path):
    """preimages=True emits Delta's full row vocabulary: update_preimage/
    update_postimage pairs, deletes carrying the PRE-delete image, stale
    and absent-delete rows still suppressed."""
    import pytest

    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    feed = (
        tbl.read_changes(since_epoch=0, change_types=True, preimages=True)
        .orderBy("conv_id", "_change_epoch", "_change_type")
        .toPandas()
    )
    got = list(
        zip(
            feed["conv_id"],
            feed["_change_epoch"],
            feed["_change_type"],
            feed["text"],
            feed["lsn"],
        )
    )
    assert got == [
        ("a", 0, "insert", "a-v0", 1),
        ("a", 1, "update_postimage", "a-v1", 11),
        ("a", 1, "update_preimage", "a-v0", 1),
        # the delete carries the PRE-delete image (Delta's delete row),
        # not the tombstone's NULL payload
        ("a", 3, "delete", "a-v1", 11),
        ("a", 4, "insert", "a-v4", 41),
        ("b", 1, "insert", "b-v1", 12),
        ("c", 0, "insert", "c-v0", 3),
    ]
    # the pair shares its epoch; keys identical on both images
    pair = feed[(feed["_change_epoch"] == 1) & (feed["conv_id"] == "a")]
    assert set(pair["_change_type"]) == {
        "update_preimage",
        "update_postimage",
    }
    # guard: preimages without typed classification is meaningless
    with pytest.raises(ValueError, match="requires change_types"):
        tbl.read_changes(0, preimages=True)


def test_preimages_compose_with_column_projection(spark, tmpdir_path):
    tbl = _mk_scenario(spark, tmpdir_path + "/t")
    feed = tbl.read_changes(
        0, change_types=True, preimages=True, columns=["text"]
    )
    assert feed.columns == [
        "conv_id",
        "turn_idx",
        "text",
        "_change_type",
        "_change_epoch",
    ]
    full = tbl.read_changes(0, change_types=True, preimages=True).select(
        *feed.columns
    )
    assert sorted(map(tuple, feed.collect()), key=str) == sorted(
        map(tuple, full.collect()), key=str
    )

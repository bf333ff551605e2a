"""Predicate delete (delete_where — the Delta ``DELETE FROM … WHERE``
analog; the reference has no ad-hoc delete at all).

Contracts pinned here: matching LIVE rows become tombstones carrying the
row's OWN order tuple, so a stale re-delivery of exactly the deleted
version keeps losing (under BOTH storage modes — the MoR read collapse
breaks exact order ties toward the tombstone) while a genuinely newer
update resurrects the key; only buckets holding matches are rewritten
(untouched buckets keep their exact file lists); existing tombstones and
NULL-predicate rows ride through; the op is maintenance-grade (no changes-
feed emission), and time travel below the delete still shows the rows.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)

_T0 = datetime(2024, 3, 1, 12, 0, 0)


def _row(lsn, conv, turn, ts=None, op="update", text="x"):
    dead = op == "delete"
    return (
        lsn,
        op,
        conv,
        turn,
        None if dead else "u",
        None if dead else text,
        None,
        ts or (_T0 + timedelta(seconds=lsn)),
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_delete_where_semantics(spark, tmpdir_path, mode):
    tbl = create_transcripts_table(
        spark, tmpdir_path + f"/t_{mode}", n_buckets=4, mode=mode
    )
    rows = [
        _row(1, "c1", 1),
        _row(2, "c2", 7),   # matches the delete predicate
        _row(3, "c3", 7),   # matches
        _row(4, "c4", 2),
    ]
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=0)
    before_files = {
        b: list(fs) for b, fs in tbl._snapshot["buckets"].items()
    }
    v_before = tbl._snapshot["version"]

    n = tbl.delete_where("turn_idx = 7")
    assert n == 2
    live = {r.conv_id for r in tbl.read().collect()}
    assert live == {"c1", "c4"}
    # idempotent: nothing left to match
    assert tbl.delete_where("turn_idx = 7") == 0
    # only the matched buckets were rewritten
    changed = {
        b
        for b in before_files
        if tbl._snapshot["buckets"].get(b, []) != before_files[b]
    }
    matched_buckets = {
        str(tbl._bucket_of(c)) for c in ("c2", "c3")
    }
    assert changed == matched_buckets
    # time travel below the delete still shows the rows
    assert tbl.read(version=v_before).count() == 4

    # stale re-delivery of EXACTLY the deleted version: must keep losing
    stale = spark.createDataFrame([_row(2, "c2", 7)], _COLS)
    apply_changes(tbl, stale, epoch_id=1)
    assert {r.conv_id for r in tbl.read().collect()} == {"c1", "c4"}

    # genuinely newer update: resurrects (delete-then-upsert, like Delta)
    newer = spark.createDataFrame(
        [_row(3, "c3", 7, ts=_T0 + timedelta(hours=1), text="back")], _COLS
    )
    apply_changes(tbl, newer, epoch_id=2)
    state = {r.conv_id: r for r in tbl.read().collect()}
    assert set(state) == {"c1", "c4", "c3"}
    assert state["c3"].text == "back"


def test_mor_delete_where_appends_not_rewrites(spark, tmpdir_path):
    """MoR delete_where is the deletion-vector analog: matched buckets get
    appended tombstone delta files and keep every pre-existing file in
    place (O(matched rows) written, zero rewrite); the appended layer is
    invisible to the changes feed and folds away under compaction."""
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=4, mode="mor"
    )
    rows = [_row(i, f"c{i}", i % 3) for i in range(1, 13)]
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=0)
    before = {b: list(fs) for b, fs in tbl._snapshot["buckets"].items()}
    feed_before = sorted(
        (r.conv_id, r.turn_idx)
        for r in tbl.read_changes(0).select("conv_id", "turn_idx").collect()
    )
    n = tbl.delete_where("turn_idx = 0")
    assert n == 4  # conv 3, 6, 9, 12
    for b, fs in before.items():
        after = tbl._snapshot["buckets"][b]
        # strict append: the old list is a prefix of the new one
        assert after[: len(fs)] == fs
    # maintenance deletes never enter the changes feed
    feed_after = sorted(
        (r.conv_id, r.turn_idx)
        for r in tbl.read_changes(0).select("conv_id", "turn_idx").collect()
    )
    assert feed_after == feed_before
    live = {r.conv_id for r in tbl.read().collect()}
    assert live == {f"c{i}" for i in range(1, 13) if i % 3 != 0}
    # the layer folds under compaction with identical state
    assert tbl.compact(max_files=0) > 0
    assert {r.conv_id for r in tbl.read().collect()} == live
    # and a stale re-delivery of a deleted version still loses post-fold
    apply_changes(
        tbl, spark.createDataFrame([_row(3, "c3", 0)], _COLS), epoch_id=1
    )
    assert {r.conv_id for r in tbl.read().collect()} == live


def test_delete_where_guards(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tg", n_buckets=2)
    with pytest.raises(ValueError, match="does not resolve"):
        tbl.delete_where("no_such_column = 1")
    # empty table: no matches, no commit
    assert tbl.delete_where("turn_idx = 7") == 0
    apply_changes(
        tbl,
        spark.createDataFrame(
            [_row(1, "c1", 1), _row(2, "c2", 2, text=None)], _COLS
        ),
        epoch_id=0,
    )
    # NULL predicate result keeps the row (SQL three-valued logic):
    # length(NULL) > 0 is UNKNOWN for c2 -> only rows where it is TRUE go
    assert tbl.delete_where("length(text) > 0") == 1
    assert {r.conv_id for r in tbl.read().collect()} == {"c2"}
    # existing tombstones ride through a later unrelated delete
    assert tbl.delete_where("turn_idx = 2") == 1
    assert tbl.read().count() == 0
    rep = tbl.verify_integrity(deep=True)
    assert rep["ok"]

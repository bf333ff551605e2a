"""Tombstone lifecycle: guard stale re-deliveries, then purge past the
retention watermark."""

from __future__ import annotations

from datetime import datetime

from mas_scada_bulkingest_spark.lake.snapshot_table import _TOMBSTONE
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_purge_respects_watermark_and_keeps_live_rows(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    apply_changes(
        tbl,
        spark.createDataFrame(
            [
                (1, "insert", "a", 0, "user", "xa", None, _t(1)),
                (2, "insert", "b", 0, "user", "xb", None, _t(1)),
                (3, "delete", "a", 0, None, None, None, _t(2)),
                (4, "delete", "b", 0, None, None, None, _t(2)),
            ],
            _COLS,
        ),
        0,
    )
    assert tbl.read().count() == 0
    raw = tbl._read_raw()
    assert raw.filter(raw[_TOMBSTONE]).count() == 2

    # watermark below both tombstone lsns: nothing purged
    assert tbl.purge_tombstones(before_lsn=3) == 0
    # watermark covers lsn 3 only
    assert tbl.purge_tombstones(before_lsn=4) == 1
    raw2 = tbl._read_raw()
    assert raw2.filter(raw2[_TOMBSTONE]).count() == 1

    # purged key 'a' can now be resurrected by a stale insert (documented:
    # purge only below the re-delivery horizon); unpurged 'b' stays guarded
    st = apply_changes(
        tbl,
        spark.createDataFrame(
            [(2, "insert", "b", 0, "user", "stale", None, _t(1))], _COLS
        ),
        1,
    )
    assert st.skipped == 1 and tbl.read().count() == 0

    # full purge; live rows unaffected
    st2 = apply_changes(
        tbl,
        spark.createDataFrame([(9, "insert", "c", 0, "user", "xc", None, _t(9))], _COLS),
        2,
    )
    assert st2.applied == 1
    assert tbl.purge_tombstones() == 1
    rows = tbl.read().collect()
    assert len(rows) == 1 and rows[0]["conv_id"] == "c"


def test_purge_rewrites_only_affected_buckets(spark, tmpdir_path):
    """The purge is bucket-targeted: buckets without purgeable tombstones
    keep their exact file lists (no whole-table rewrite for one tombstone —
    the 100 TB retention-sweep property)."""
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=8)
    rows = [
        (i + 1, "insert", f"c{i}", 0, "user", f"x{i}", None, _t(1))
        for i in range(32)
    ]
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), 0)
    apply_changes(
        tbl,
        spark.createDataFrame(
            [(100, "delete", "c0", 0, None, None, None, _t(2))], _COLS
        ),
        1,
    )
    before = {b: list(fs) for b, fs in tbl._snapshot["buckets"].items()}
    live_before = sorted(r["conv_id"] for r in tbl.read().collect())
    assert tbl.purge_tombstones() == 1
    after = tbl._snapshot["buckets"]
    changed = [b for b in before if after.get(b) != before[b]]
    # exactly one bucket (the one holding c0's tombstone) was rewritten
    assert len(changed) == 1
    assert sorted(r["conv_id"] for r in tbl.read().collect()) == live_before

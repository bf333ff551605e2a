"""restore() — snapshot rollback as a new commit (Delta RESTORE analog).

Contracts pinned here: restore rewinds table content (rows AND schema) to
the target version as an append-only commit; rolled-back epochs leave the
committed set so a repaired replay re-applies them (the rollback-and-repair
workflow); the changes feed never serves rolled-back delta files and never
double-serves a repaired epoch; restoring forward past an earlier restore
keeps that restore's own exclusions; expired targets raise.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)
_COLS_META = _COLS + ", metadata string"


def _mk(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode=mode)
    rows0 = [
        (i, "update", f"c{i}", 0, "u", f"v{i}", None, datetime(2024, 1, 1, 0, 0, i))
        for i in range(8)
    ]
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", None, datetime(2024, 1, 1, 1)),
        (101, "delete", "c1", 0, None, None, None, datetime(2024, 1, 1, 1, 0, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), epoch_id=0)
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS), epoch_id=1)
    return tbl


def _state(tbl):
    cols = [c for c in ("conv_id", "turn_idx", "text", "lsn", "metadata")
            if c in tbl.read().columns]
    return (
        tbl.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[cols]
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_restore_rollback_then_repaired_replay(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    good = _state(tbl)
    v_good = tbl._snapshot["version"]
    n_fields = len(tbl.schema.fields)

    # a bad epoch that also evolves the schema
    bad = [(200, "update", "c2", 0, "u", "CORRUPT", None,
            datetime(2024, 1, 2), "m1")]
    apply_changes(tbl, spark.createDataFrame(bad, _COLS_META), epoch_id=2)
    assert "CORRUPT" in set(_state(tbl)["text"])
    assert len(tbl.schema.fields) == n_fields + 1

    new_v = tbl.restore(v_good)
    assert new_v == tbl._snapshot["version"] and new_v > v_good
    assert _state(tbl).equals(good)            # rows rewound
    assert len(tbl.schema.fields) == n_fields  # schema rewound
    assert not tbl.is_epoch_committed(2)       # epoch 2 un-committed

    # repaired replay of the SAME epoch id re-applies (not a no-op)
    fix = [(200, "update", "c2", 0, "u", "fixed", None, datetime(2024, 1, 2))]
    st = apply_changes(tbl, spark.createDataFrame(fix, _COLS), epoch_id=2)
    assert not st.was_noop and st.applied == 1
    texts = set(_state(tbl)["text"])
    assert "fixed" in texts and "CORRUPT" not in texts
    # and exactly-once is re-armed for the repaired epoch
    st2 = apply_changes(tbl, spark.createDataFrame(fix, _COLS), epoch_id=2)
    assert st2.was_noop


def test_restore_feed_excludes_rolled_back_epochs(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    v_good = tbl._snapshot["version"]
    bad = [(200, "update", "c2", 0, "u", "CORRUPT", None, datetime(2024, 1, 2))]
    apply_changes(tbl, spark.createDataFrame(bad, _COLS), epoch_id=2)
    assert 2 in set(
        r["_change_epoch"] for r in tbl.read_changes(0).collect()
    )

    tbl.restore(v_good)
    feed = tbl.read_changes(0).toPandas()
    assert set(feed["_change_epoch"]) == {0, 1}
    assert "CORRUPT" not in set(feed["text"].dropna())

    # repaired replay: feed serves ONLY the repaired rows for epoch 2
    fix = [(201, "update", "c2", 0, "u", "fixed", None, datetime(2024, 1, 2))]
    apply_changes(tbl, spark.createDataFrame(fix, _COLS), epoch_id=2)
    e2 = tbl.read_changes(2, to_epoch=2).toPandas()
    assert list(e2["text"]) == ["fixed"]  # no double-serve
    # typed classification over the restored lineage stays consistent
    typed = tbl.read_changes(0, change_types=True).toPandas()
    c2 = typed[typed["conv_id"] == "c2"].sort_values("_change_epoch")
    assert list(c2["_change_type"]) == ["insert", "update"]
    assert list(c2["text"]) == ["v2", "fixed"]  # CORRUPT gone from lineage


def test_restore_noop_forward_and_expired(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    v1 = tbl._snapshot["version"]
    assert tbl.restore(v1) == v1  # no-op

    apply_changes(
        tbl,
        spark.createDataFrame(
            [(300, "update", "c7", 1, "u", "late", None, datetime(2024, 1, 3))],
            _COLS,
        ),
        epoch_id=2,
    )
    v2 = tbl._snapshot["version"]
    with_late = _state(tbl)
    tbl.restore(v1)
    assert "late" not in set(_state(tbl)["text"])
    # restore FORWARD to the pre-rollback version: content returns
    tbl.restore(v2)
    assert _state(tbl).equals(with_late)
    assert tbl.is_epoch_committed(2)
    # and the feed serves epoch 2 again (exclusions recomputed, not sticky)
    assert set(tbl.read_changes(2).toPandas()["text"]) == {"late"}

    tbl.vacuum()  # expires old snapshots
    with pytest.raises(FileNotFoundError, match="restore"):
        tbl.restore(v1)


def test_restore_then_vacuum_integrity(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    before = _state(tbl)
    v = tbl._snapshot["version"]
    apply_changes(
        tbl,
        spark.createDataFrame(
            [(400, "update", "c9", 0, "u", "x", None, datetime(2024, 1, 4))],
            _COLS,
        ),
        epoch_id=3,
    )
    tbl.restore(v)
    tbl.vacuum()
    assert _state(tbl).equals(before)
    rep = tbl.verify_integrity()
    assert rep["ok"], rep


def test_restore_to_timestamp(spark, tmpdir_path):
    """RESTORE … TIMESTAMP AS OF sugar: resolves through at_timestamp's
    rule (latest snapshot committed at or before ts) and applies restore's
    full contract."""
    import time

    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    rows0 = [(1, "update", "c1", 0, "u", "a", None, datetime(2024, 1, 1))]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), epoch_id=0)
    stamp = tbl._snapshot["committed_at"]
    state_v1 = sorted(map(tuple, tbl.read().collect()))
    time.sleep(0.05)
    rows1 = [(2, "update", "c1", 0, "u", "b", None, datetime(2024, 1, 2))]
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS), epoch_id=1)
    assert sorted(map(tuple, tbl.read().collect())) != state_v1
    tbl.restore_to_timestamp(stamp)
    assert sorted(map(tuple, tbl.read().collect())) == state_v1

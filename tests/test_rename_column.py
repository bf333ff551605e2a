"""rename_column() — metadata-only rename via a read-time alias coalesce
(Iceberg RENAME COLUMN analog without field ids).

Contracts pinned here: the rename rewrites no data file yet every read —
table, time-travel-to-now, changes feed — serves old-name files under the
NEW name with their values intact; renames chain; batches still using the
old name map onto the new one (both names at once raise); the old name is
reserved against re-evolution; drop after rename retires all former names;
restore below the rename brings the old name back; verify_integrity treats
old-name footers as healthy; key/order/collision names refuse.
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
_COLS_NEW = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool_name string, ts timestamp_ntz"
)


def _mk(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode=mode)
    rows0 = [
        (i, "update", f"c{i}", 0, "u", f"v{i}", f"t{i}", datetime(2024, 1, 1, 0, 0, i))
        for i in range(6)
    ]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), epoch_id=0)
    return tbl


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_rename_preserves_old_file_values(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    files_before = sorted(f for fs in tbl._snapshot["buckets"].values() for f in fs)
    v = tbl.rename_column("tool", "tool_name")
    # zero data movement
    files_after = sorted(f for fs in tbl._snapshot["buckets"].values() for f in fs)
    assert files_after == files_before
    assert "tool" not in tbl.read().columns
    got = {r["conv_id"]: r["tool_name"] for r in tbl.read().collect()}
    assert got == {f"c{i}": f"t{i}" for i in range(6)}
    # time travel below the rename still shows the old name
    assert "tool" in tbl.read(version=v - 1).columns


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_mixed_old_and_new_files_read_consistently(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    tbl.rename_column("tool", "tool_name")
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", "NEW0", datetime(2024, 1, 1, 1)),
        (101, "update", "c9", 0, "u", "v9", "NEW9", datetime(2024, 1, 1, 1, 0, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS_NEW), epoch_id=1)
    got = {r["conv_id"]: r["tool_name"] for r in tbl.read().collect()}
    assert got["c0"] == "NEW0" and got["c9"] == "NEW9"  # new-name files
    assert got["c1"] == "t1" and got["c5"] == "t5"  # old-name files, aliased


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_lagging_batch_with_old_name_maps_in(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    tbl.rename_column("tool", "tool_name")
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", "LAGGED", datetime(2024, 1, 1, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS), epoch_id=1)
    assert "tool" not in tbl.schema.fieldNames()  # not re-added
    got = {r["conv_id"]: r["tool_name"] for r in tbl.read().collect()}
    assert got["c0"] == "LAGGED"


def test_both_names_in_one_batch_raises(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    tbl.rename_column("tool", "tool_name")
    both = _COLS + ", tool_name string"
    rows = [
        (100, "update", "c0", 0, "u", "x", "old", datetime(2024, 1, 2), "new"),
    ]
    with pytest.raises(ValueError, match="ambiguous"):
        apply_changes(tbl, spark.createDataFrame(rows, both), epoch_id=1)


def test_chained_rename_and_registry_rules(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    tbl.rename_column("tool", "tool_a")
    tbl.rename_column("tool_a", "tool_b")
    got = {r["conv_id"]: r["tool_b"] for r in tbl.read().collect()}
    assert got["c3"] == "t3"  # two hops back to the original files
    assert tbl._snapshot["column_aliases"] == {"tool_b": ["tool", "tool_a"]}
    for name in (*tbl.key, *tbl.order):
        with pytest.raises(ValueError, match="key/LWW-order"):
            tbl.rename_column(name, "x")
    with pytest.raises(ValueError, match="already exists"):
        tbl.rename_column("role", "text")
    with pytest.raises(ValueError, match="former name"):
        tbl.rename_column("role", "tool_a")
    rep = tbl.verify_integrity()
    assert rep["ok"], rep


def test_changes_feed_spans_the_rename(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    tbl.rename_column("tool", "tool_name")
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", "NEW", datetime(2024, 1, 1, 1)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS_NEW), epoch_id=1)
    feed = tbl.read_changes(0).orderBy("conv_id", "_change_epoch").collect()
    assert "tool_name" in feed[0].asDict()
    by = {(r["conv_id"], r["_change_epoch"]): r["tool_name"] for r in feed}
    assert by[("c1", 0)] == "t1"  # epoch-0 delta file stored 'tool'
    assert by[("c0", 1)] == "NEW"


def test_drop_after_rename_and_restore_roundtrip(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    v_pre = tbl._snapshot["version"]
    tbl.rename_column("tool", "tool_name")
    tbl.drop_column("tool_name")
    # all former names retired with the drop; old-name footers stay healthy
    assert set(tbl._snapshot["dropped_columns"]) == {"tool", "tool_name"}
    assert tbl._snapshot["column_aliases"] == {}
    assert tbl.verify_integrity()["ok"]
    with pytest.raises(ValueError, match="dropped"):
        tbl.rename_column("role", "tool_name")
    # restore below everything: original name and values return
    tbl.restore(v_pre)
    got = {r["conv_id"]: r["tool"] for r in tbl.read().collect()}
    assert got == {f"c{i}": f"t{i}" for i in range(6)}
    assert tbl._snapshot.get("column_aliases", {}) == {}
    assert tbl._snapshot.get("dropped_columns", []) == []

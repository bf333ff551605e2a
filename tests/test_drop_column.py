"""drop_column() — metadata-only column drop (Iceberg DROP COLUMN analog).

Contracts pinned here: the drop rewrites no data file yet hides the column
from every read; values of the remaining columns are bit-identical; a later
batch still carrying the dropped column does NOT resurrect it (the
dropped_columns registry is the name-based analog of Iceberg field ids);
time travel below the drop still shows the column; restore to a pre-drop
version resurrects it and clears the registry entry; key/order/unknown
names refuse; verify_integrity stays clean over pre-drop files.
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


def _mk(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=2, mode=mode)
    rows0 = [
        (i, "update", f"c{i}", 0, "u", f"v{i}", f"t{i}", datetime(2024, 1, 1, 0, 0, i))
        for i in range(6)
    ]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), epoch_id=0)
    return tbl


def _state(tbl, cols=("conv_id", "turn_idx", "text", "lsn")):
    return (
        tbl.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[list(cols)]
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_drop_is_metadata_only_and_hides_column(spark, tmpdir_path, mode):
    import pandas as pd

    tbl = _mk(spark, tmpdir_path + "/t", mode)
    before = _state(tbl)
    files_before = sorted(f for fs in tbl._snapshot["buckets"].values() for f in fs)
    v = tbl.drop_column("tool")

    assert "tool" not in tbl.read().columns
    assert "tool" not in tbl.schema.fieldNames()
    # zero data movement: the exact same files back the post-drop version
    files_after = sorted(f for fs in tbl._snapshot["buckets"].values() for f in fs)
    assert files_after == files_before
    pd.testing.assert_frame_equal(_state(tbl), before)
    # time travel below the drop still shows the column with its values
    old = tbl.read(version=v - 1).orderBy("conv_id").toPandas()
    assert list(old["tool"]) == [f"t{i}" for i in range(6)]


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_late_batch_does_not_resurrect_dropped_column(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    tbl.drop_column("tool")
    rows1 = [
        (100, "update", "c0", 0, "u", "v0b", "ZOMBIE", datetime(2024, 1, 1, 1)),
        (101, "update", "c9", 0, "u", "v9", "ZOMBIE", datetime(2024, 1, 1, 1, 0, 1)),
    ]
    st = apply_changes(tbl, spark.createDataFrame(rows1, _COLS), epoch_id=1)
    assert st.applied == 2
    # neither re-added to the schema nor resurrected from retained files
    assert "tool" not in tbl.schema.fieldNames()
    assert "tool" not in tbl.read().columns
    got = {
        r["conv_id"]: r["text"]
        for r in tbl.read().select("conv_id", "text").collect()
    }
    assert got["c0"] == "v0b" and got["c9"] == "v9"


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_drop_refuses_identity_and_unknown(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    for name in (*tbl.key, *tbl.order):
        with pytest.raises(ValueError, match="key/LWW-order"):
            tbl.drop_column(name)
    with pytest.raises(ValueError, match="no column"):
        tbl.drop_column("nope")
    tbl.drop_column("tool")
    with pytest.raises(ValueError, match="already dropped"):
        tbl.drop_column("tool")


def test_integrity_and_restore_roundtrip(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    v_pre = tbl._snapshot["version"]
    tbl.drop_column("tool")
    # pre-drop files still carry the column: expected, not schema drift
    rep = tbl.verify_integrity()
    assert rep["ok"], rep
    # restore below the drop resurrects the column and clears the registry
    tbl.restore(v_pre)
    assert "tool" in tbl.schema.fieldNames()
    assert tbl._snapshot.get("dropped_columns", []) == []
    assert list(
        tbl.read().orderBy("conv_id").select("tool").toPandas()["tool"]
    ) == [f"t{i}" for i in range(6)]
    # and evolution works again for the resurrected name going forward
    rows = [
        (200, "update", "c0", 0, "u", "v0c", "fresh", datetime(2024, 1, 2)),
    ]
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=7)
    got = {r["conv_id"]: r["tool"] for r in tbl.read().collect()}
    assert got["c0"] == "fresh" and got["c1"] == "t1"

"""rebucket() — offline resharding under a new bucket count.

The analog of changing an Iceberg bucket(N, key) partition transform: one
atomic full rewrite; state, committed epochs, tombstone semantics, and time
travel must all survive the boundary.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from mas_scada_bulkingest_spark.lake.snapshot_table import _bucket_expr
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

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
def test_rebucket_preserves_state_and_epochs(spark, tmpdir_path, mode):
    tbl = _mk(spark, tmpdir_path + "/t", mode)
    before = _state(tbl)
    old_version = tbl._snapshot["version"]
    n = tbl.rebucket(5)
    assert n > 0 and tbl.n_buckets == 5
    assert _state(tbl).equals(before)
    # files actually live in their new-layout buckets
    for b, files in tbl._snapshot["buckets"].items():
        got = (
            spark.read.parquet(*[f"{tbl.path}/{f}" for f in files])
            .select(_bucket_expr("conv_id", 5).alias("b"))
            .distinct()
            .collect()
        )
        assert [r["b"] for r in got] == [int(b)]
    # committed epochs survive: replaying them is a no-op
    st = apply_changes(
        tbl,
        spark.createDataFrame(
            [(0, "update", "cX", 0, "u", "x", None, datetime(2024, 1, 1))], _COLS
        ),
        epoch_id=0,
    )
    assert st.was_noop
    # time travel across the reshard boundary: old layout still readable
    assert _state(tbl.at_version(old_version)).equals(before)


def test_rebucket_keeps_tombstone_watermarks(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    tbl.rebucket(4)
    # stale re-delivery for the deleted key arrives AFTER the reshard —
    # the tombstone's (ts, lsn) must still win
    stale = [(50, "update", "c1", 0, "u", "zombie", None, datetime(2024, 1, 1, 0, 30))]
    apply_changes(tbl, spark.createDataFrame(stale, _COLS), epoch_id=7)
    assert tbl.read().filter(F.col("conv_id") == "c1").count() == 0


def test_rebucket_then_merge_lands_in_new_buckets(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "mor")
    tbl.rebucket(8)
    rows = [
        (200 + i, "update", f"n{i}", 1, "u", f"w{i}", None, datetime(2024, 1, 2, 0, 0, i))
        for i in range(10)
    ]
    apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=9)
    got = _state(tbl)
    assert set(got[got.turn_idx == 1]["text"]) == {f"w{i}" for i in range(10)}
    # windowed skipping keeps working on the new layout (stats recomputed)
    win = tbl.read(min_event_time="2024-01-02").toPandas()
    assert set(win["text"]) == {f"w{i}" for i in range(10)}


def test_rebucket_noop_and_validation(spark, tmpdir_path):
    tbl = _mk(spark, tmpdir_path + "/t", "cow")
    assert tbl.rebucket(tbl.n_buckets) == 0
    with pytest.raises(ValueError):
        tbl.rebucket(0)

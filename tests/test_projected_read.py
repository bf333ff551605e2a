"""read(columns=[…]) — manifest-level column pruning.

The MoR read's frozen-RDD barrier hides the scan from Catalyst's own
column pruning, and the LWW collapse only needs (key, order, tombstone)
to pick winners — so the projection must narrow the PINNED SCAN SCHEMA
itself. Pinned here: projected values equal the full read's, output
schema is key ∪ requested in table order, the parquet ReadSchema really
narrows (checked on the un-frozen plan), unknown names raise, and the
projection composes with event-time windowing and schema evolution.
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


def _row(lsn, conv, turn, op="update", text="x"):
    dead = op == "delete"
    return (
        lsn,
        op,
        conv,
        turn,
        None if dead else "u",
        None if dead else text,
        None,
        _T0 + timedelta(seconds=lsn),
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_projected_read_values_and_schema(spark, tmpdir_path, mode):
    tbl = create_transcripts_table(
        spark, tmpdir_path + f"/t_{mode}", n_buckets=4, mode=mode
    )
    apply_changes(
        tbl,
        spark.createDataFrame([_row(i, f"c{i % 5}", i % 3) for i in range(20)], _COLS),
        0,
    )
    # a delete + a late re-delivery: winner selection must still be exact
    # when unprojected payload columns are never scanned
    apply_changes(
        tbl,
        spark.createDataFrame(
            [_row(100, "c1", 0, op="delete"), _row(50, "c2", 0, text="stale")],
            _COLS,
        ),
        1,
    )
    proj = tbl.read(columns=["text"])
    assert [f.name for f in proj.schema.fields] == ["conv_id", "turn_idx", "text"]
    expect = tbl.read().select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, proj.collect())) == sorted(map(tuple, expect.collect()))

    # order columns are readable internally but excluded unless requested
    assert "ts" not in proj.columns
    w = tbl.read(columns=["text"], min_event_time=_T0 + timedelta(seconds=10))
    ew = tbl.read(min_event_time=_T0 + timedelta(seconds=10)).select(
        "conv_id", "turn_idx", "text"
    )
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, ew.collect()))

    with pytest.raises(ValueError, match="unknown column"):
        tbl.read(columns=["nope"])


def test_projection_reaches_the_scan(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    apply_changes(
        tbl, spark.createDataFrame([_row(i, f"c{i}", 0) for i in range(6)], _COLS), 0
    )
    # un-freeze so the executed plan's FileScan is inspectable
    spark.conf.set("spark.mas_scada.mor.read.freeze_interpreted", "false")
    try:
        tbl._collapsed_plan_cache = None
        plan = (
            tbl.read(columns=["text"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.mas_scada.mor.read.freeze_interpreted", "true")
        tbl._collapsed_plan_cache = None
    assert "ReadSchema" in plan
    # the scan's ReadSchema carries key+order+text+tombstone, NOT the
    # unrequested payload columns
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas and all("role" not in l and "tool" not in l for l in read_schemas)
    assert any("text" in l for l in read_schemas)

    # CoW: plain scan, same check
    cow = create_transcripts_table(
        spark, tmpdir_path + "/c", n_buckets=2, mode="cow"
    )
    apply_changes(
        cow, spark.createDataFrame([_row(i, f"c{i}", 0) for i in range(6)], _COLS), 0
    )
    cplan = (
        cow.read(columns=["text"])._jdf.queryExecution().executedPlan().toString()
    )
    crs = [l for l in cplan.splitlines() if "ReadSchema" in l]
    assert crs and all("role" not in l for l in crs)


def test_projection_with_evolution(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    apply_changes(
        tbl, spark.createDataFrame([_row(1, "c1", 0), _row(2, "c2", 0)], _COLS), 0
    )
    evolved = _COLS + ", metadata string"
    apply_changes(
        tbl,
        spark.createDataFrame([_row(3, "c3", 0) + ("m",)], evolved),
        1,
    )
    proj = tbl.read(columns=["metadata"]).toPandas().set_index("conv_id")
    assert proj.loc["c3", "metadata"] == "m"
    assert proj.loc[["c1", "c2"], "metadata"].isna().all()


def test_projected_lookup(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=4, mode="mor"
    )
    apply_changes(
        tbl, spark.createDataFrame([_row(i, f"c{i % 5}", i % 3) for i in range(15)], _COLS), 0
    )
    got = tbl.lookup("c1", 0, columns=["text"])
    assert [f.name for f in got.schema.fields] == ["conv_id", "turn_idx", "text"]
    full = tbl.lookup("c1", 0).select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))

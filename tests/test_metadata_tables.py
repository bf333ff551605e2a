"""Metadata inspection tables: files() and partitions() — the Iceberg
``<table>.files`` / ``<table>.partitions`` analogs (reference parity: the
Java connector logs per-run file accounting in DataUtilities.java; here
the manifest answers it queryably, with zero data scan).

Pinned contracts: one row per live data file with correct bucket / origin
classification (epoch delta vs bootstrap/compact base vs deletewhere
delta), manifest byte+record counts that reconcile with history() and the
actual table, data-skipping bounds surfaced, per-bucket rollup consistent
with the file rows, and time-travel composition (at_version().files()).
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
def test_files_and_partitions(spark, tmpdir_path, mode):
    tbl = create_transcripts_table(
        spark, tmpdir_path + f"/t_{mode}", n_buckets=4, mode=mode
    )
    rows0 = [_row(i, f"c{i % 7}", i % 3) for i in range(40)]
    apply_changes(tbl, spark.createDataFrame(rows0, _COLS), 0)
    rows1 = [_row(100 + i, f"c{i % 5}", i % 3) for i in range(20)]
    apply_changes(tbl, spark.createDataFrame(rows1, _COLS), 1)
    v_before_delete = tbl._snapshot["version"]

    files = tbl.files().toPandas().set_index("file_path")
    snap_files = {f for fs in tbl._snapshot["buckets"].values() for f in fs}
    # one row per live file, bucket matches the manifest
    assert set(files.index) == snap_files
    for b, fs in tbl._snapshot["buckets"].items():
        for f in fs:
            assert files.loc[f, "bucket"] == int(b)
    # every file so far is an epoch delta (MoR) or epoch rewrite tag (CoW
    # writes epoch-tagged outputs too — origin is still "epoch")
    assert set(files["origin"]) == {"epoch"}
    assert sorted(files["epoch"].unique()) == [0, 1]
    assert files["is_delta"].all()
    # manifest records reconcile with the actual stored row count
    import pyarrow.parquet as pq
    import os

    for f, r in files["records"].items():
        assert r == pq.ParquetFile(os.path.join(tbl.path, f)).metadata.num_rows
    assert (files["bytes"] > 0).all()
    # skip bounds present and ordered (ts is the order column, all stats
    # usable on this data)
    assert files["bound_min"].notna().all()
    assert (files["bound_min"] <= files["bound_max"]).all()

    # bytes reconcile with history()'s live_bytes for the current version
    hist = tbl.history().toPandas()
    live = hist[hist["version"] == tbl._snapshot["version"]].iloc[0]
    assert int(files["bytes"].sum()) == int(live["live_bytes"])
    assert len(files) == int(live["live_files"])

    parts = tbl.partitions().toPandas().set_index("bucket")
    assert set(parts.index) == {int(b) for b, fs in tbl._snapshot["buckets"].items() if fs}
    for b in parts.index:
        sub = files[files["bucket"] == b]
        assert parts.loc[b, "files"] == len(sub)
        assert parts.loc[b, "bytes"] == sub["bytes"].sum()
        assert parts.loc[b, "records"] == sub["records"].sum()
        assert parts.loc[b, "delta_files"] == int(sub["is_delta"].sum())
        assert parts.loc[b, "bound_min"] == sub["bound_min"].min()
        assert parts.loc[b, "bound_max"] == sub["bound_max"].max()
        assert parts.loc[b, "stats_coverage"] == 1.0

    # maintenance ops reclassify: delete_where appends a deletewhere delta
    # (MoR) / rewrites matched buckets (CoW); compact folds MoR deltas
    tbl.delete_where("conv_id = 'c1'")
    files2 = tbl.files().toPandas()
    if mode == "mor":
        dw = files2[files2["origin"] == "deletewhere"]
        assert len(dw) >= 1 and dw["is_delta"].all()
        assert dw["epoch"].isna().all()
        n_compacted = tbl.compact(max_files=1)
        assert n_compacted > 0
        files3 = tbl.files().toPandas()
        comp = files3[files3["origin"] == "compact"]
        assert len(comp) > 0 and not comp["is_delta"].any()
        # compacted buckets now report zero pending deltas
        parts3 = tbl.partitions().toPandas()
        assert (
            parts3.loc[parts3["bucket"].isin(comp["bucket"]), "delta_files"]
            == 0
        ).all()
        # compacted base files hold many keys -> digest overflowed for the
        # big ones OR present for small; just check the column is boolean
        assert files3["has_key_digest"].dtype == bool
    else:
        # CoW delete rewrote only matched buckets; others keep epoch origin
        assert set(files2["origin"]) <= {"epoch", "deletewhere"}

    # time travel: the pre-delete snapshot still reports the old layout
    old = tbl.at_version(v_before_delete).files().toPandas()
    assert set(old["file_path"]) == snap_files


def test_files_empty_table(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/e", n_buckets=4)
    assert tbl.files().count() == 0
    assert tbl.partitions().count() == 0

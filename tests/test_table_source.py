"""Structured-Streaming table source (format("table_changes")) — the lake
table itself as a stream (Delta streaming-source analog, built on Spark 4's
Python DataSource API).

Pinned contracts: an availableNow drain serves exactly the batch
read_changes feed (values, not just counts — schema evolution NULL-fill
and tombstone deletes included); a restarted query under the same
checkpoint serves ONLY epochs committed since (exactly-once tail, offsets
= epochs); maxEpochsPerBatch splits catch-up into multiple micro-batches;
rename_column aliases resolve in the executor-side pyarrow read; CoW
tables are refused at stream construction.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)
from mas_scada_bulkingest_spark.streaming.table_source import (
    TableChangesDataSource,
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


def _drain(spark, path, ckpt, **opts):
    """availableNow drain; returns (batch row-dfs, final pandas)."""
    spark.dataSource.register(TableChangesDataSource)
    reader = spark.readStream.format("table_changes").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    feed = reader.load()
    batches: list[pd.DataFrame] = []
    q = (
        feed.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.toPandas())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    non_empty = [b for b in batches if len(b)]
    out = (
        pd.concat(non_empty, ignore_index=True)
        if non_empty
        else pd.DataFrame()
    )
    return batches, out


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(
        ["_change_epoch", "conv_id", "turn_idx"]
    ).reset_index(drop=True)


def test_stream_equals_batch_feed_and_tails(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=4, mode="mor"
    )
    apply_changes(
        tbl, spark.createDataFrame([_row(i, f"c{i%5}", i % 3) for i in range(20)], _COLS), 0
    )
    apply_changes(
        tbl,
        spark.createDataFrame(
            [_row(100, "c1", 0, op="delete"), _row(101, "c9", 1, text="new")],
            _COLS,
        ),
        1,
    )

    _, streamed = _drain(spark, tbl.path, tmpdir_path + "/ck")
    expect = tbl.read_changes(0).toPandas()
    pd.testing.assert_frame_equal(
        _sorted(streamed), _sorted(expect), check_dtype=False
    )
    # tombstone delete classified
    dels = streamed[streamed["_change_type"] == "delete"]
    assert list(dels["conv_id"]) == ["c1"] and dels["text"].isna().all()

    # tail: a new epoch after the drain; same checkpoint serves ONLY it
    apply_changes(
        tbl, spark.createDataFrame([_row(200, "c2", 2, text="upd")], _COLS), 2
    )
    _, tail = _drain(spark, tbl.path, tmpdir_path + "/ck")
    assert sorted(tail["_change_epoch"].unique()) == [2]
    pd.testing.assert_frame_equal(
        _sorted(tail),
        _sorted(tbl.read_changes(since_epoch=2).toPandas()),
        check_dtype=False,
    )
    # nothing new -> an idle drain serves zero rows
    _, idle = _drain(spark, tbl.path, tmpdir_path + "/ck")
    assert len(idle) == 0


def test_schema_evolution_null_fill(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=4, mode="mor"
    )
    for e in range(4):
        apply_changes(
            tbl,
            spark.createDataFrame([_row(10 * e + i, f"c{i}", e) for i in range(4)], _COLS),
            e,
        )
    # additive evolution in the last epoch: metadata column appears
    evolved = _COLS + ", metadata string"
    rows = [r + ("m1",) for r in [_row(100, "c0", 9), _row(101, "c1", 9)]]
    apply_changes(tbl, spark.createDataFrame(rows, evolved), 4)

    _, streamed = _drain(spark, tbl.path, tmpdir_path + "/ck")
    expect = tbl.read_changes(0).toPandas()
    pd.testing.assert_frame_equal(
        _sorted(streamed), _sorted(expect), check_dtype=False
    )
    # pre-evolution epochs fill NULL metadata; epoch 4 carries it
    assert streamed.loc[streamed["_change_epoch"] < 4, "metadata"].isna().all()
    assert (streamed.loc[streamed["_change_epoch"] == 4, "metadata"] == "m1").all()


def test_rate_limit_admission_control(spark, tmpdir_path):
    """maxEpochsPerBatch caps offset progression across the triggers of a
    live run. The Spark-side call order (latestOffset before initialOffset,
    no restart callback) makes the first offset of a run uncapped by
    design; this drives the reader at the unit level with the documented
    trigger sequence of a fresh continuous run."""
    from mas_scada_bulkingest_spark.streaming.table_source import (
        TableChangesStreamReader,
        TableChangesDataSource,
    )

    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    for e in range(6):
        apply_changes(
            tbl, spark.createDataFrame([_row(e, f"c{e}", 0)], _COLS), e
        )
    ds = TableChangesDataSource({"path": tbl.path})
    schema = ds.schema()
    r = TableChangesStreamReader(
        schema, {"path": tbl.path, "maxEpochsPerBatch": "2"}
    )
    start = r.initialOffset()
    assert start == {"epoch": -1}
    # trigger 1: capped two epochs ahead of the start cursor
    o1 = r.latestOffset()
    assert o1 == {"epoch": 1}
    parts = r.partitions(start, o1)
    assert sorted({p.epoch for p in parts}) == [0, 1]
    # trigger 2/3: the cap advances batch by batch until caught up
    o2 = r.latestOffset()
    assert o2 == {"epoch": 3}
    r.partitions(o1, o2)
    o3 = r.latestOffset()
    assert o3 == {"epoch": 5}
    # caught up: offset holds (never regresses) until new commits land
    assert r.latestOffset() == {"epoch": 5}
    apply_changes(
        tbl, spark.createDataFrame([_row(9, "c9", 0)], _COLS), 6
    )
    assert r.latestOffset() == {"epoch": 6}
    # restart safety: a reader that never saw initialOffset (checkpoint
    # restart) returns the TRUE head uncapped — never below a checkpoint
    r2 = TableChangesStreamReader(
        schema, {"path": tbl.path, "maxEpochsPerBatch": "2"}
    )
    assert r2.latestOffset() == {"epoch": 6}


def test_rename_alias_resolves_in_stream(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    apply_changes(
        tbl,
        spark.createDataFrame([_row(1, "c0", 0), _row(2, "c1", 1)], _COLS),
        0,
    )
    tbl.rename_column("tool", "tool_name")
    _, streamed = _drain(spark, tbl.path, tmpdir_path + "/ck")
    assert "tool_name" in streamed.columns and "tool" not in streamed.columns
    pd.testing.assert_frame_equal(
        _sorted(streamed), _sorted(tbl.read_changes(0).toPandas()), check_dtype=False
    )


def test_stream_survives_compaction(spark, tmpdir_path):
    """Compaction folds delta files out of the CURRENT snapshot before the
    stream ever starts; the source must still serve every epoch (the
    history-wide file walk read_changes pins, now through the stream)."""
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    for e in range(3):
        apply_changes(
            tbl,
            spark.createDataFrame([_row(10 * e + i, f"c{i}", e) for i in range(3)], _COLS),
            e,
        )
    assert tbl.compact(max_files=1) > 0  # deltas folded into base files
    _, streamed = _drain(spark, tbl.path, tmpdir_path + "/ck")
    pd.testing.assert_frame_equal(
        _sorted(streamed), _sorted(tbl.read_changes(0).toPandas()), check_dtype=False
    )
    assert sorted(streamed["_change_epoch"].unique()) == [0, 1, 2]


def test_batch_reader_range(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    for e in range(4):
        apply_changes(
            tbl,
            spark.createDataFrame([_row(10 * e + i, f"c{i}", e) for i in range(3)], _COLS),
            e,
        )
    spark.dataSource.register(TableChangesDataSource)
    got = (
        spark.read.format("table_changes")
        .option("path", tbl.path)
        .option("sinceEpoch", 1)
        .option("toEpoch", 2)
        .load()
        .toPandas()
    )
    expect = tbl.read_changes(since_epoch=1, to_epoch=2).toPandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(expect), check_dtype=False)


def test_cow_refused(spark, tmpdir_path):
    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="cow"
    )
    apply_changes(tbl, spark.createDataFrame([_row(1, "c0", 0)], _COLS), 0)
    spark.dataSource.register(TableChangesDataSource)
    feed = (
        spark.readStream.format("table_changes")
        .option("path", tbl.path)
        .load()
    )
    q = (
        feed.writeStream.format("noop")
        .option("checkpointLocation", tmpdir_path + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="merge-on-read"):
        q.awaitTermination(60)
        raise RuntimeError("stream should have failed")


def test_schema_change_mid_stream_fails_loudly(spark, tmpdir_path):
    """Delta streaming-source parity: a mid-stream schema change fails the
    query instead of silently serving epochs without the new column."""
    from mas_scada_bulkingest_spark.streaming.table_source import (
        TableChangesStreamReader,
    )

    tbl = create_transcripts_table(
        spark, tmpdir_path + "/t", n_buckets=2, mode="mor"
    )
    apply_changes(tbl, spark.createDataFrame([_row(1, "c1", 0)], _COLS), 0)
    spark.dataSource.register(TableChangesDataSource)
    ds = TableChangesDataSource({"path": tbl.path})
    r = TableChangesStreamReader(ds.schema(), {"path": tbl.path})
    start = r.initialOffset()
    # evolve mid-stream, then plan the next batch
    evolved = _COLS + ", metadata string"
    apply_changes(
        tbl, spark.createDataFrame([_row(2, "c2", 0) + ("m",)], evolved), 1
    )
    with pytest.raises(RuntimeError, match="schema changed mid-stream"):
        r.partitions(start, r.latestOffset())
    # a restarted reader (fresh schema) serves both epochs
    r2 = TableChangesStreamReader(ds.schema(), {"path": tbl.path})
    parts = r2.partitions(r2.initialOffset(), r2.latestOffset())
    assert sorted({p.epoch for p in parts}) == [0, 1]
    # maxEpochsPerBatch=0 is rejected up front, not a frozen stream
    with pytest.raises(ValueError, match="maxEpochsPerBatch"):
        TableChangesStreamReader(
            ds.schema(), {"path": tbl.path, "maxEpochsPerBatch": "0"}
        )

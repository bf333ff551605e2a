"""Debezium envelope parser: op mapping, before-image deletes, exact
epoch-millis timestamps, malformed routing, and end-to-end MERGE compose.

Reference analog: the connector's input is a JDBC scan of already-relational
rows (DBConnector.java:89-256); a Spark-native binlog tail instead receives
Kafka-Connect JSON envelopes, so the parser is the missing first stage of
the north_rule's "binlog/WAL tail -> lake upsert" flow.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import types as T

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.schemas import TRANSCRIPT_SCHEMA
from mas_scada_bulkingest_spark.sources import parse_debezium

PAYLOAD = T.StructType(
    [f for f in TRANSCRIPT_SCHEMA.fields if f.name not in ("ts", "lsn")]
)


def _env(op, key, payload=None, ts_ms=1704067200000, lsn=1):
    before = after = None
    body = {"conv_id": key[0], "turn_idx": key[1], **(payload or {})}
    if op == "d":
        before = body
    else:
        after = body
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms,
         "source": {"lsn": lsn}}
    )


def _parse(spark, envs, **kw):
    df = spark.createDataFrame([(e,) for e in envs], "value string")
    return parse_debezium(df, "value", PAYLOAD, **kw)


def test_op_mapping_and_sides(spark):
    envs = [
        _env("c", ("a", 0), {"role": "user", "text": "hi"}, lsn=1),
        _env("u", ("a", 1), {"role": "assistant", "text": "yo"}, lsn=2),
        _env("r", ("b", 0), {"role": "user", "text": "snap"}, lsn=3),
        _env("d", ("a", 0), {"role": "user", "text": "bye"}, lsn=4),
    ]
    rows = {r["lsn"]: r for r in _parse(spark, envs).collect()}
    assert [rows[i]["op"] for i in (1, 2, 3)] == ["update"] * 3
    assert rows[4]["op"] == "delete"
    # delete: key from the BEFORE image, payload nulled (tombstone contract)
    assert rows[4]["conv_id"] == "a" and rows[4]["turn_idx"] == 0
    assert rows[4]["text"] is None and rows[4]["role"] is None
    assert rows[2]["text"] == "yo"


def test_ts_ms_exact_integer_conversion(spark):
    # 2024-01-01T00:00:00 UTC + 123 ms — millis must survive exactly
    got = _parse(spark, [_env("u", ("a", 0), ts_ms=1704067200123)]).collect()[0]
    assert got["ts"] == datetime(2024, 1, 1, 0, 0, 0, 123000)


def test_malformed_drop_and_keep(spark):
    envs = [
        _env("u", ("a", 0), {"text": "ok"}, lsn=1),
        '{"truncated": ',                     # unparseable JSON
        _env("x", ("a", 1), lsn=2),          # unknown op
        json.dumps({"after": {"role": "u"}, "op": "u",
                    "ts_ms": 1, "source": {"lsn": 3}}),  # keyless
    ]
    assert _parse(spark, envs).count() == 1
    kept = _parse(spark, envs, on_malformed="keep")
    assert kept.count() == 4
    assert kept.filter(F.col("op").isNull()).count() == 2  # bad JSON + op x
    # keyless row survives keep-mode with op set (caller's DLQ decides)
    assert kept.filter(F.col("op").isNotNull() & F.col("conv_id").isNull()).count() == 1


def test_streaming_debezium_tail(spark, tmpdir_path):
    """readStream(text of JSON envelopes) -> parse_debezium -> exactly-once
    MERGE: the wire-format decode runs inside each micro-batch plan; a
    truncated envelope in the stream is dropped, replaying the drained
    stream under the same checkpoint commits nothing new."""
    import os

    from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
    from mas_scada_bulkingest_spark.streaming import run_stream_debezium

    t0 = 1704067200000
    src = tmpdir_path + "/env"
    os.makedirs(src)
    with open(src + "/00.jsonl", "w") as f:
        f.write(_env("c", ("s", 0), {"role": "user", "text": "v1"}, ts_ms=t0, lsn=1) + "\n")
        f.write(_env("u", ("s", 1), {"role": "user", "text": "v2"}, ts_ms=t0, lsn=2) + "\n")
        f.write('{"broken": \n')  # truncated envelope: dropped, not fatal
    with open(src + "/01.jsonl", "w") as f:
        f.write(_env("u", ("s", 0), {"role": "user", "text": "v1b"}, ts_ms=t0 + 1000, lsn=3) + "\n")
        f.write(_env("d", ("s", 1), ts_ms=t0 + 1000, lsn=4) + "\n")

    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    q = run_stream_debezium(
        spark, src, tmpdir_path + "/t", tmpdir_path + "/ckpt", PAYLOAD,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    final = tbl.read().orderBy("turn_idx").toPandas()
    assert final["text"].tolist() == ["v1b"]  # turn 1 deleted, turn 0 updated
    n_epochs = tbl.committed_epoch_count
    # drained replay under the same checkpoint: no new epochs
    q2 = run_stream_debezium(
        spark, src, tmpdir_path + "/t", tmpdir_path + "/ckpt", PAYLOAD,
    )
    q2.awaitTermination(180)
    assert SnapshotTable(spark, tmpdir_path + "/t").committed_epoch_count == n_epochs


def test_streaming_dlq_captures_raw_envelopes(spark, tmpdir_path):
    """dlq_dir routes malformed envelopes (original wire bytes + epoch key)
    to a dead-letter parquet instead of silently dropping them; good rows
    still merge."""
    import os

    from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
    from mas_scada_bulkingest_spark.streaming import run_stream_debezium

    src = tmpdir_path + "/env"
    os.makedirs(src)
    broken = '{"oops": '
    keyless = '{"after": {"role": "u"}, "op": "u", "ts_ms": 1, "source": {"lsn": 9}}'
    with open(src + "/00.jsonl", "w") as f:
        f.write(_env("c", ("d", 0), {"role": "user", "text": "good"}, lsn=1) + "\n")
        f.write(broken + "\n")
        f.write(keyless + "\n")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    q = run_stream_debezium(
        spark, src, tmpdir_path + "/t", tmpdir_path + "/ckpt", PAYLOAD,
        dlq_dir=tmpdir_path + "/dlq",
    )
    q.awaitTermination(180)
    final = SnapshotTable(spark, tmpdir_path + "/t").read().toPandas()
    assert final["text"].tolist() == ["good"]
    dlq = spark.read.parquet(tmpdir_path + "/dlq").toPandas()
    assert sorted(dlq["envelope"]) == sorted([broken, keyless])
    assert dlq["epoch_key"].str.contains(":").all()


def test_parse_composes_with_merge(spark, tmpdir_path):
    """parse -> apply_changes end-to-end: late stale update loses to the
    tombstone parsed from a Debezium delete."""
    t0 = 1704067200000
    e0 = [
        _env("c", ("k", 0), {"role": "user", "text": "v1"}, ts_ms=t0, lsn=1),
        _env("u", ("k", 1), {"role": "user", "text": "keep"}, ts_ms=t0, lsn=2),
    ]
    e1 = [_env("d", ("k", 0), ts_ms=t0 + 5000, lsn=3)]
    e2 = [_env("u", ("k", 0), {"role": "user", "text": "stale"}, ts_ms=t0 + 1000, lsn=4)]
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    for i, envs in enumerate((e0, e1, e2)):
        apply_changes(tbl, _parse(spark, envs), epoch_id=i)
    final = tbl.read().toPandas()
    assert final["text"].tolist() == ["keep"]  # delete holds; stale update lost

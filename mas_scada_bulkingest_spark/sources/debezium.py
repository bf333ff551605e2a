"""Debezium/WAL JSON envelope parser → engine change records.

A real binlog/WAL tail (the north_rule's input) is almost never the engine's
clean ``(op, key…, payload…, ts, lsn)`` shape on the wire: Kafka Connect /
Debezium deliver one JSON *envelope* per mutation::

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"u"|"d"|"r", "ts_ms": 1704067200000,
     "source": {"lsn": 123, ...}}

``parse_debezium`` turns a DataFrame with such an envelope column into the
engine's change schema with PURE column expressions (``from_json`` + struct
field access — JVM-side, whole-stage-codegen'd, zero per-row Python), so it
composes with both the batch MERGE path (``apply_changes``) and Structured
Streaming sources (``readStream`` from Kafka delivers exactly this shape in
``value``). Mapping:

* ``op``: ``c``/``u``/``r`` (create / update / snapshot-read) → ``update`` —
  the engine's MERGE is an upsert, so creates and snapshot reads are the
  same idempotent apply (reference analog: the blind
  insert-behind-unique-index treats first and repeat sightings identically,
  MonitorTable.java:70-76); ``d`` → ``delete``.
* key + payload columns come from ``after`` for upserts and from ``before``
  for deletes (a Debezium delete has ``after = null``); a tombstone row in
  the engine carries the delete's (ts, lsn) watermark downstream.
* ``ts`` ← ``ts_ms`` (epoch millis → TIMESTAMP_NTZ, integer arithmetic —
  no float rounding); ``lsn`` ← ``source.lsn``.

Malformed envelopes (unparseable JSON, missing ``op``, or an op with no
usable key side) are routed by ``on_malformed``:

* ``"drop"`` (default): filtered out — the streaming-safe choice; count
  them upstream via ``observe`` if lineage of rejects is needed.
* ``"keep"``: kept with ``op = NULL`` so the caller can side-channel them
  (dead-letter queue) with one ``filter``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The envelope struct schema for a given row payload schema."""
    return T.StructType(
        [
            T.StructField("before", payload_schema),
            T.StructField("after", payload_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source", T.StructType([T.StructField("lsn", T.LongType())])
            ),
        ]
    )


def malformed_predicate(key_cols: Sequence[str] = ("conv_id", "turn_idx")):
    """The parser's reject rule as a reusable Column predicate: unparseable
    JSON / unknown op (``op`` NULL) or any NULL key field (no home bucket).
    Evaluate against :func:`parse_debezium` output."""
    pred = F.col("op").isNull()
    for k in key_cols:
        pred = pred | F.col(k).isNull()
    return pred


def parse_debezium(
    df: DataFrame,
    envelope_col: str,
    payload_schema: T.StructType,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    on_malformed: str = "drop",
    keep_raw: bool = False,
) -> DataFrame:
    """Parse a JSON envelope column into engine change records.

    Returns one row per envelope with columns ``(op, <payload columns>, ts,
    lsn)`` where the payload columns are ``payload_schema``'s fields (key
    columns from the op's live side, value columns NULL on deletes — the
    tombstone contract ``merge_changes`` expects). ``keep_raw=True`` appends
    the original envelope string as ``_raw_envelope`` — a malformed row's
    parsed fields are all NULL, so dead-letter routing needs the raw bytes
    for forensics; drop the column before merging.
    """
    if on_malformed not in ("drop", "keep"):
        raise ValueError(f"on_malformed must be 'drop' or 'keep', got {on_malformed!r}")
    env = F.from_json(F.col(envelope_col), debezium_envelope_schema(payload_schema))
    is_del = env["op"] == "d"
    # key side: after for c/u/r, before for d; malformed when neither holds
    # the key (from_json yields NULL structs on parse failure)
    side = F.when(is_del, env["before"]).otherwise(env["after"])
    op = (
        F.when(env["op"].isin("c", "u", "r"), F.lit("update"))
        .when(is_del, F.lit("delete"))
        .otherwise(F.lit(None).cast("string"))
    )
    key_set = set(key_cols)
    cols = [op.alias("op")]
    for f in payload_schema.fields:
        if f.name in key_set:
            cols.append(side[f.name].alias(f.name))
        else:
            # value columns: NULL on delete even if the connector included
            # the full before-image (tombstones store no payload by contract)
            cols.append(
                F.when(~is_del, env["after"][f.name]).alias(f.name)
            )
    # epoch millis -> TIMESTAMP_NTZ in exact integer arithmetic: seconds via
    # integer division, the millisecond remainder as an exact microsecond
    # interval (no double rounding -> oracle-hash-stable)
    ts = (
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        + F.make_dt_interval(secs=F.floor(env["ts_ms"] / F.lit(1000)))
        + F.make_dt_interval(
            secs=F.pmod(env["ts_ms"], F.lit(1000)).cast("decimal(10,3)")
            / F.lit(1000)
        )
    )
    cols.append(ts.alias("ts"))
    cols.append(env["source"]["lsn"].alias("lsn"))
    if keep_raw:
        cols.append(F.col(envelope_col).alias("_raw_envelope"))
    out = df.select(*cols)
    if on_malformed == "drop":
        out = out.filter(~malformed_predicate(key_cols))
    return out

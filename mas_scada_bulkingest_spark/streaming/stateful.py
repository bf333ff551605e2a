"""Custom stateful streaming operator: per-conversation running progress.

The reference keeps process-lifetime running counters (`processedCount`,
`entityCount` AtomicLongs, OffsetRecord.java:47-51, 104-134) and a per-entity
cache (Connector.java:127-132) — global, in-memory, lost on crash. This
module re-expresses that as a *keyed, fault-tolerant* Structured Streaming
stateful operator: ``applyInPandasWithState`` partitions the change stream by
``conv_id``, keeps per-conversation state (event/delete counts, max turn,
max lsn, latest event time) in the streaming state store (checkpointed,
restored on restart), and emits an updated progress row per conversation per
micro-batch — Arrow-batched, zero per-row Python in the hot loop.

This is the pattern for any custom per-key streaming aggregate Spark lacks
as a builtin (sessionization, per-conversation quota tracking, anomaly
windows): state lives in the state store, arithmetic stays vectorized on
pandas batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-conversation state kept in the streaming state store
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_ts", T.TimestampNTZType()),
    ]
)

#: one progress row per conversation per micro-batch
PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_ts", T.TimestampNTZType()),
    ]
)


def _update_progress(key, pdfs, state: GroupState):
    """Fold this batch's events for one conversation into its state."""
    (conv_id,) = key
    if state.exists:
        n_events, n_deletes, max_turn, max_lsn, last_ts = state.get
    else:
        n_events, n_deletes, max_turn, max_lsn, last_ts = 0, 0, -1, -1, None
    for pdf in pdfs:  # vectorized per Arrow batch
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "delete").sum())
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        batch_last = pdf["ts"].max()
        last_ts = batch_last if last_ts is None else max(last_ts, batch_last)
    state.update((n_events, n_deletes, max_turn, max_lsn, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_events": [n_events],
            "n_deletes": [n_deletes],
            "max_turn": [max_turn],
            "max_lsn": [max_lsn],
            "last_ts": [last_ts],
        }
    )


def _batch_progress(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch form of the same fold (whole history is one 'batch', so the
    cumulative row is a plain per-group aggregate)."""
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_events": [len(pdf)],
            "n_deletes": [int((pdf["op"] == "delete").sum())],
            "max_turn": [int(pdf["turn_idx"].max())],
            "max_lsn": [int(pdf["lsn"].max())],
            "last_ts": [pdf["ts"].max()],
        }
    )


def conversation_progress(changes: DataFrame) -> DataFrame:
    """Attach the stateful per-conversation progress operator to a (streaming
    or batch) change DataFrame. In streaming, state persists across
    micro-batches via the checkpointed state store and each batch emits the
    cumulative row for every conversation it touched (output mode
    ``update``); on a batch DataFrame (where Spark forbids
    ``applyInPandasWithState``) the identical fold runs as a stateless
    ``applyInPandas`` per group."""
    keyed = changes.select("conv_id", "op", "turn_idx", "lsn", "ts").groupBy("conv_id")
    if not changes.isStreaming:
        return keyed.applyInPandas(_batch_progress, schema=PROGRESS_SCHEMA)
    return keyed.applyInPandasWithState(
        _update_progress,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Cascading CDC: maintain a PERSISTED derived table off a source table's
changes feed, exactly-once and incrementally.

The reference pipeline stops at the fact table; real deployments hang
derived artifacts off it (per-conversation rollups, serving indexes,
registries) and keep them fresh without rescanning the source — the
Delta-CDF → downstream-MERGE pattern. This module implements that pattern
over this engine's own primitives, so the output of one exactly-once
pipeline is the input of the next:

* **cursor** — the derived table's own committed-epoch log doubles as the
  feed cursor: a refresh covering source epochs ``[a, b]`` commits into the
  derived table under epoch id ``b``, so ``derived.last_committed_epoch``
  IS the resume point. Crash after merge-commit → rerun is a no-op; crash
  before → rerun re-folds the same range. No side-channel state.
* **O(changed) refresh, not O(table)** — the affected conversation set
  comes from ``read_changes`` (O(changes in range)); recompute reads ONLY
  the buckets those conversations hash to (``read(buckets=…)``), then
  semi-joins the broadcast affected set. At 4096 buckets and a bounded
  refresh cadence that is a small fraction of a 100 TB table per refresh.
* **monotone LWW order** — the derived row's order column is the REFRESH
  epoch, not the conversation's (ts, lsn): deleting the turn that held a
  conversation's max lsn makes the recomputed aggregate's (ts, lsn) go
  BACKWARDS, and an order built on them would let the stale rollup win at
  read time. Refresh epochs only grow, so later refreshes always win
  (regression-pinned in tests/test_derived.py).

Correctness invariant (driver-checked by the ``cdc_derived_rollup`` oracle
entry): fold-of-deltas ≡ recompute-from-scratch — any split of the epoch
range into refreshes lands the same derived state as one full build.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .lake.snapshot_table import MergeStats, SnapshotTable, _bucket_expr

#: per-conversation rollup maintained by :func:`refresh_rollup`
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("live_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("last_ts", T.TimestampNTZType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("refresh_epoch", T.LongType()),
    ]
)


def create_conversation_rollup(
    spark: SparkSession, path: str, n_buckets: int = 8, mode: str = "mor"
) -> SnapshotTable:
    """CREATE IF NOT EXISTS the per-conversation rollup table. Keyed by
    ``conv_id``, LWW-ordered by ``refresh_epoch`` (see module docstring for
    why NOT (ts, lsn))."""
    return SnapshotTable.create(
        spark,
        path,
        ROLLUP_SCHEMA,
        n_buckets=n_buckets,
        key=("conv_id",),
        order=("refresh_epoch",),
        mode=mode,
    )


def rollup_state(state: DataFrame, key: str = "conv_id") -> DataFrame:
    """The rollup aggregate over a (slice of) source live state — shared by
    the incremental refresh and the from-scratch oracle recompute."""
    return state.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("live_turns"),
        F.sum(F.coalesce(F.length("text"), F.lit(0)))
        .cast("long")
        .alias("total_chars"),
        F.max("ts").alias("last_ts"),
        F.max("lsn").cast("long").alias("max_lsn"),
    )


def refresh_rollup(
    source: SnapshotTable,
    derived: SnapshotTable,
    to_epoch: int | None = None,
) -> MergeStats | None:
    """Fold source epochs ``(derived.last_committed_epoch, to_epoch]`` into
    the derived rollup, exactly once. Returns the merge stats, or ``None``
    when the derived table is already caught up. ``to_epoch=None`` = the
    source's latest committed epoch.

    Affected conversations are recomputed from source state (delete +
    re-aggregate per key — robust to ANY change shape, including the
    non-incrementable aggregates like max); conversations whose every turn
    is gone become tombstones in the derived table.
    """
    last = derived.last_committed_epoch
    latest = source.last_committed_epoch if to_epoch is None else int(to_epoch)
    if latest <= last:
        return None
    key = source.key[0]
    feed = source.read_changes(last + 1, latest)
    affected = feed.select(key).distinct()
    # bucket pruning: the affected set hashes to a (often small) subset of
    # buckets — read only those. The bucket ids are O(n_buckets) to collect.
    b_ids = sorted(
        r["b"]
        for r in affected.select(
            _bucket_expr(key, source.n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    state = source.read(buckets=b_ids)
    live = (
        rollup_state(state.join(F.broadcast(affected), key, "left_semi"), key)
        .withColumn("refresh_epoch", F.lit(latest).cast("long"))
        .withColumn("op", F.lit("update"))
    )
    gone = (
        affected.join(live.select(key), key, "left_anti")
        .withColumn("live_turns", F.lit(None).cast("long"))
        .withColumn("total_chars", F.lit(None).cast("long"))
        .withColumn("last_ts", F.lit(None).cast("timestamp_ntz"))
        .withColumn("max_lsn", F.lit(None).cast("long"))
        .withColumn("refresh_epoch", F.lit(latest).cast("long"))
        .withColumn("op", F.lit("delete"))
    )
    batch = live.unionByName(gone.select(*live.columns))
    return derived.merge_changes(batch, epoch_id=latest)


def rebuild_rollup(
    source: SnapshotTable, derived: SnapshotTable
) -> MergeStats | None:
    """Full-recompute fallback for when the incremental feed cannot serve
    the pending range — exactly the cases where ``read_changes`` raises
    ``FileNotFoundError`` telling the consumer to "recompute downstream
    state from a full read()": a vacuum-truncated feed, or a ``clone()``d
    source whose feed floor sits above the derived cursor.

    One O(table) pass: re-aggregate every conversation from live source
    state, upsert all, and tombstone derived keys whose conversation no
    longer exists. Commits under the source's latest epoch id, so the
    incremental cursor is caught up afterwards and :func:`refresh_rollup`
    resumes incrementally from there. Idempotent like any refresh (rerun
    no-ops); returns ``None`` when the derived table is already caught up.

    NOT the recovery path after ``source.restore()``: a restore moves the
    source's epoch cursor BACKWARDS, which this cursor scheme cannot
    express — restore the derived table to its matching earlier version
    too (it is a SnapshotTable; ``restore`` works on it), or start a fresh
    derived table.
    """
    last = derived.last_committed_epoch
    latest = source.last_committed_epoch
    if latest <= last:
        return None
    key = source.key[0]
    live = (
        rollup_state(source.read(), key)
        .withColumn("refresh_epoch", F.lit(latest).cast("long"))
        .withColumn("op", F.lit("update"))
    )
    gone = (
        derived.read()
        .select(key)
        .join(live.select(key), key, "left_anti")
        .withColumn("live_turns", F.lit(None).cast("long"))
        .withColumn("total_chars", F.lit(None).cast("long"))
        .withColumn("last_ts", F.lit(None).cast("timestamp_ntz"))
        .withColumn("max_lsn", F.lit(None).cast("long"))
        .withColumn("refresh_epoch", F.lit(latest).cast("long"))
        .withColumn("op", F.lit("delete"))
    )
    batch = live.unionByName(gone.select(*live.columns))
    return derived.merge_changes(batch, epoch_id=latest)

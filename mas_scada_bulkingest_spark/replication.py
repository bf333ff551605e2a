"""Table-to-table replication off the changes feed.

``sync_replica(source, replica)`` folds everything the source committed
since the replica's cursor into ONE exactly-once merge on the replica —
the lake-native form of cross-region / blue-green replication driven by
Delta-CDF-style incremental reads instead of a second trip through the
binlog. The reference has no replication concept; its nearest analog is
re-running the whole extract against a second destination.

Design (scale-first):

* **One merge per sync, not one per source epoch.** The feed rows for the
  whole ``[cursor+1, to_epoch]`` range are applied as a single batch: the
  LWW collapse picks each key's global winner across the range exactly as
  replaying the epochs one-by-one would (winner-of-winners == winner over
  the union — the collapse order is total), so catching up 10^4 source
  epochs costs one shuffle, not 10^4 driver-bound merges.
* **Resumable by cursor.** The replica's merge commits under the range's
  max SOURCE epoch id, so ``replica.last_committed_epoch`` IS the sync
  cursor: a crashed sync replays the same range and no-ops, the next sync
  resumes from the cursor — the same contract ``derived.refresh_rollup``
  uses, applied to a full-fidelity table copy instead of an aggregate.
* **Deletes replicate as deletes.** Feed delete rows carry the tombstone's
  (ts, lsn) watermark, so the replica's tombstones end up with the SAME
  LWW order as the source's — late stale updates lose identically on both
  tables.
* **Schema evolution rides along.** The feed serves evolved columns (NULL
  for pre-evolution files); the replica's additive schema merge widens on
  the sync that first carries them.

Truncation contract (same as ``refresh_rollup``): if the source vacuumed
feed files inside the pending range, ``read_changes`` raises
``FileNotFoundError`` — re-seed the replica from a full read (e.g.
``replica.bootstrap(source.read(), epoch_id=source.last_committed_epoch)``)
rather than silently losing epochs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .lake.snapshot_table import MergeStats, SnapshotTable
from .pipeline import apply_changes


def sync_replica(
    source: SnapshotTable,
    replica: SnapshotTable,
    to_epoch: int | None = None,
) -> MergeStats | None:
    """Catch the replica up to the source's committed state.

    Returns the merge stats of the catch-up epoch, or ``None`` when the
    replica is already current. The replica must be sync-only (its epoch
    ids are the source's epoch numbers; writing to it directly would
    corrupt the cursor).
    """
    if source.mode != "mor":
        raise ValueError(
            "sync_replica reads the source's changes feed, which requires "
            "a merge-on-read source table"
        )
    cursor = replica.last_committed_epoch
    target = to_epoch if to_epoch is not None else source.last_committed_epoch
    if target <= cursor:
        return None
    feed = source.read_changes(cursor + 1, target)
    return apply_changes(
        replica, _feed_to_batch(feed), epoch_id=int(target)
    )


def _feed_to_batch(feed):
    """Changes-feed rows -> a mergeable change batch (op column from the
    feed's change type; feed bookkeeping columns dropped)."""
    return feed.withColumn(
        "op",
        F.when(F.col("_change_type") == "delete", F.lit("delete")).otherwise(
            F.lit("update")
        ),
    ).drop("_change_type", "_change_epoch")


def run_stream_replica(
    spark,
    source_path: str,
    replica: SnapshotTable,
    checkpoint: str,
    available_now: bool = True,
    max_epochs_per_batch: int | None = None,
):
    """CONTINUOUS replication: tail the source table through the
    ``table_changes`` Structured-Streaming source and fold every
    micro-batch into the replica — ``sync_replica`` composed with Spark's
    own trigger/offset machinery instead of a polling loop. The first
    stream-native consumer of the table-as-a-source (``streaming/
    table_source.py``); the reference's nearest analog is re-running its
    whole extract at a second destination on a timer.

    Exactly-once composes at BOTH layers: Spark's checkpoint replays a
    failed micro-batch as the identical epoch range, whose fold commits
    under the range's max SOURCE epoch — already committed on the replica
    ⇒ no-op (the ``sync_replica`` cursor contract, per micro-batch). A
    fresh checkpoint over an already-current replica starts at the
    replica's cursor (``sinceEpoch``), so nothing double-applies; overlap
    from a divergent restart resolves by LWW like any re-delivery.

    Returns the started StreamingQuery.
    """
    from .streaming.table_source import TableChangesDataSource

    try:
        spark.dataSource.register(TableChangesDataSource)
    except Exception:
        pass  # already registered
    reader = (
        spark.readStream.format("table_changes")
        .option("path", source_path)
        .option("sinceEpoch", replica.last_committed_epoch + 1)
    )
    if max_epochs_per_batch is not None:
        reader = reader.option("maxEpochsPerBatch", max_epochs_per_batch)

    def _fold(df, _batch_id):
        # persist: the max-epoch probe AND the merge both consume the
        # batch, and an un-persisted foreachBatch df re-runs the source's
        # per-file reads per action — on a 10^4-epoch catch-up drain that
        # doubles the file I/O
        df.persist()
        try:
            target = df.agg(F.max("_change_epoch")).first()[0]
            if target is None:
                return  # empty micro-batch
            apply_changes(replica, _feed_to_batch(df), epoch_id=int(target))
        finally:
            df.unpersist()

    writer = reader.load().writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

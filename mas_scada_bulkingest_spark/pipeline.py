"""End-to-end CDC apply pipeline: parse → normalize → collapse → MERGE.

The Spark re-expression of the reference's ``extractAndUpload`` cycle
(DBConnector.java:89-256): where the reference walks a JDBC cursor row by row
into a column map and batch-inserts per entity type, this pipeline is a pure
DataFrame plan per micro-batch, applied to the lake table inside
``foreachBatch`` (or the batched replay driver), guarded by the epoch commit
log for exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import normalize_text
from .lake.snapshot_table import MergeStats, SnapshotTable, compute_bucket_stats
from .operators.lww import collapse_lww
from .operators.skew import hot_keys
from .schemas import TRANSCRIPT_SCHEMA


def parse_changes(df: DataFrame, normalize: bool = False) -> DataFrame:
    """Validate/canonicalize a raw change-record batch.

    * enforces the CDC envelope types (lsn long, turn_idx int, ts timestamp)
    * drops malformed ops (analog of the reference's silent skip of unknown
      source columns, DBConnector.java:449-461)
    * optional text normalization via the vectorized Arrow UDF
    """
    out = df
    if "lsn" in out.columns:
        out = out.withColumn("lsn", F.col("lsn").cast("long"))
    if "turn_idx" in out.columns:
        out = out.withColumn("turn_idx", F.col("turn_idx").cast("int"))
    out = out.filter(F.col("op").isin("insert", "update", "delete"))
    if normalize:
        out = out.withColumn("text", normalize_text(F.col("text")))
    return out


def apply_changes(
    table: SnapshotTable,
    batch: DataFrame,
    epoch_id: int | str,
    normalize: bool = False,
    skew_salt: int | None = None,
    hot_key_threshold: int | None = None,
) -> MergeStats:
    """Apply one micro-batch of change records to ``table`` exactly once.

    ``skew_salt=N`` forces the explicit two-phase salted LWW collapse.
    ``hot_key_threshold=K`` first detects conversations with >K events in the
    batch and salt-repartitions only those before the collapse (north_rule's
    explicit skew splitting); cold batches skip the extra pass.
    """
    if str(epoch_id) in table.committed_epochs:
        return table.merge_changes(batch.limit(0), epoch_id)  # cheap no-op path

    parsed = parse_changes(batch, normalize=normalize)
    # ONE shared pre-pass over the raw batch: per-bucket counts + max LSN.
    # It drives (a) the merge's bucket pruning and lineage watermark and
    # (b) the hot-key gate — a conversation can only be hot if its whole
    # BUCKET exceeds the threshold, so the per-conversation detection scan
    # runs only when some bucket count crosses it (rare, by construction).
    bucket_col = table.key[0]
    track = "lsn" if "lsn" in parsed.columns else None
    pre = compute_bucket_stats(parsed, bucket_col, table.n_buckets)
    some_bucket_hot = hot_key_threshold is not None and any(
        r["n_in"] > hot_key_threshold for r in pre
    )
    if some_bucket_hot and hot_keys(
        parsed, keys=(bucket_col,), min_count=hot_key_threshold
    ):
        # Hot key confirmed: force the explicit two-phase salted collapse.
        # No standalone salted_repartition here — the collapse's groupBy plans
        # its own exchange, so a prior full shuffle of the raw batch would be
        # pure wasted I/O before a hash aggregate (map-side partial agg
        # already absorbs hot keys; salting-before-shuffle only pays off
        # ahead of window/sort operators — see operators/skew.py for that
        # path). The two-phase salt splits the reduce of a pathological
        # single key across `skew_salt` reducers.
        collapsed = collapse_lww(
            parsed,
            keys=table.key,
            order=table.order,
            two_phase_salt=skew_salt or 16,
            track_max_of=track,
        )
    else:
        collapsed = collapse_lww(
            parsed,
            keys=table.key,
            order=table.order,
            two_phase_salt=skew_salt,
            track_max_of=track,
        )
    return table.merge_changes(collapsed, epoch_id, pre_stats=pre)


def create_transcripts_table(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> SnapshotTable:
    return SnapshotTable.create(spark, path, TRANSCRIPT_SCHEMA, n_buckets=n_buckets)

"""Operational status over the lineage table.

The Spark re-expression of the reference's stats surface — the HTTP
``/masdcStats`` page (StatsServer.java:64-83), the TCP CLI ``getStats``
(CLIServer.java:34-48) and the 60 s heartbeat stats row
(ConnectorStats.java:59-83) — as plain queryable functions over the
``_lineage`` table instead of sockets and background threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lake.snapshot_table import SnapshotTable


def epoch_summary(table: SnapshotTable) -> DataFrame:
    """One row per epoch: totals + throughput inputs (applied/skipped/deleted,
    max LSN watermark, partitions touched)."""
    return (
        table.lineage()
        .groupBy("epoch_id")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("applied").alias("applied"),
            F.sum("skipped").alias("skipped"),
            F.sum("deleted").alias("deleted"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("committed_ts").alias("committed_ts"),
        )
        .orderBy("epoch_id")
    )


def status(table: SnapshotTable) -> dict:
    """Driver-side snapshot of connector health (the ``getStats`` analog).

    Returns totals across all committed epochs plus table-shape facts from
    the current snapshot (no full-table scan).
    """
    lin = (
        table.lineage()
        .agg(
            F.countDistinct("epoch_id").alias("epochs"),
            F.sum("applied").alias("applied"),
            F.sum("skipped").alias("skipped"),
            F.sum("deleted").alias("deleted"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("committed_ts").alias("last_commit_ts"),
        )
        .first()
    )
    snap = table._snapshot
    n_files = sum(len(v) for v in snap["buckets"].values())
    return {
        "epochs_committed": len(table.committed_epochs),
        "epochs_with_lineage": int(lin["epochs"] or 0),
        "rows_applied": int(lin["applied"] or 0),
        "rows_skipped": int(lin["skipped"] or 0),
        "rows_deleted": int(lin["deleted"] or 0),
        "max_lsn": int(lin["max_lsn"]) if lin["max_lsn"] is not None else None,
        "last_commit_ts": str(lin["last_commit_ts"]) if lin["last_commit_ts"] else None,
        "snapshot_version": snap["version"],
        "n_buckets": snap["n_buckets"],
        "n_data_files": n_files,
        "schema_fields": [f.name for f in table.schema.fields],
    }

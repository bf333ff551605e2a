"""mas_scada_bulkingest_spark — a brand-new PySpark-native CDC/incremental-ingest engine.

Re-expresses the capabilities of the reference connector
(``ibm-watson-iot/mas-scada-bulkingest``, a Java historian->lake bulk/incremental
ingest loop) as an idiomatic Spark engine:

* binlog/WAL-style change-log source (reference: monthly historian tables +
  offset-window polling, DBConnector.java:89-256)
* vectorized parse/normalize/classify stage (reference: row-at-a-time
  ``getSourceMap``, DBConnector.java:411-498)
* last-writer-wins collapse over ``(ts, lsn)`` per ``(conv_id, turn_idx)``
  (reference: blind insert behind a unique index, MonitorTable.java:70-76)
* exactly-once epoch-committed MERGE into a lake table (reference: lossy
  ``rowsProcessed -= batchCount`` accounting, DBConnector.java:290-297)
* per-epoch per-partition lineage + metrics (reference: offset JSON + stats
  thread, OffsetRecord.java:281-302, ConnectorStats.java:59-83)

The lake layer is abstracted behind :class:`~.lake.snapshot_table.SnapshotTable`
so an Iceberg catalog can be dropped in where available; the bundled
Parquet-snapshot implementation provides the same atomic-snapshot commit
semantics without external jars.
"""

__version__ = "0.1.0"

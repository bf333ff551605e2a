"""The LakeTable seam (SURVEY.md §7.2): the bundled parquet-snapshot table
implements the ABC the engine types against; the Iceberg drop-in documents
its mapping with pure, auditable SQL builders and refuses to run without the
runtime jars (absent in this sandbox). Plus the negative-epoch-id guard."""

from __future__ import annotations

import pytest

from mas_scada_bulkingest_spark.lake import (
    IcebergTable,
    LakeTable,
    ParquetSnapshotTable,
    SnapshotTable,
    iceberg_available,
)
from mas_scada_bulkingest_spark.lake.snapshot_table import _fold_epochs
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table


def test_snapshot_table_is_a_laketable(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    assert isinstance(tbl, LakeTable)
    assert ParquetSnapshotTable is SnapshotTable


def test_iceberg_refuses_without_runtime(spark):
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergTable(spark, "cat.db.transcripts")


def test_iceberg_sql_builders_encode_the_contract():
    # pure builders — auditable without a catalog or jars
    t = object.__new__(IcebergTable)
    t.identifier = "cat.db.transcripts"
    t._key = ("conv_id", "turn_idx")
    t._order = ("ts", "lsn")
    t._n_buckets = 16

    sql = t.merge_sql("chg", ["role", "text", "tool", "ts", "lsn", "_max_lsn"])
    assert "MERGE INTO cat.db.transcripts t" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # the lexicographic (ts, lsn) LWW guard
    assert "(s.ts > t.ts OR t.ts = s.ts AND s.lsn > t.lsn)" in sql
    # deletes persist as tombstone rows carrying the delete's (ts, lsn) —
    # a physical DELETE would let a stale late update resurrect the row
    assert "THEN DELETE" not in sql
    assert "t._tombstone = (s.op = 'delete')" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql and "_tombstone" in sql
    # helper columns from collapse_lww(track_max_of=...) never reach the table
    assert "_max_lsn" not in sql

    create = IcebergTable.create_sql(
        "cat.db.transcripts", "conv_id string, turn_idx int", n_buckets=8
    )
    assert "PARTITIONED BY (bucket(8, conv_id))" in create
    assert "'write.merge.mode'='merge-on-read'" in create
    assert "_tombstone boolean" in create

    # exactly-once marker: the conf key the MERGE commit stamps and the key
    # the probe reads back MUST be the same summary property
    conf_key, conf_val = IcebergTable.epoch_commit_conf(7)
    assert conf_key == "spark.sql.iceberg.snapshot-property.engine.epoch-id"
    assert conf_val == "7"
    probe = t.epoch_committed_sql(7)
    assert "cat.db.transcripts.snapshots" in probe  # metadata-only, no scan
    assert "summary['engine.epoch-id'] = '7'" in probe

    purge = t.purge_tombstones_sql(before_lsn=100)
    assert purge.startswith("DELETE FROM cat.db.transcripts WHERE _tombstone")
    assert "lsn IS NOT NULL AND lsn < 100" in purge

    # changes feed ≙ SnapshotTable.read_changes: epoch range -> snapshot ids
    # via the SAME summary key the commit stamps; then Iceberg's incremental
    # append scan options (start is EXCLUSIVE)
    snaps = t.epoch_snapshots_sql(2, to_epoch=5)
    assert "cat.db.transcripts.snapshots" in snaps
    assert "CAST(summary['engine.epoch-id'] AS BIGINT) >= 2" in snaps
    assert "<= 5" in snaps
    opts = IcebergTable.changes_scan_options(1234, 5678)
    assert opts == {"start-snapshot-id": "1234", "end-snapshot-id": "5678"}
    assert IcebergTable.changes_scan_options(9) == {"start-snapshot-id": "9"}

    # schema-evolution DDL ≙ SnapshotTable.drop_column / rename_column;
    # key/order columns refuse on both backends
    assert (
        t.drop_column_sql("tool")
        == "ALTER TABLE cat.db.transcripts DROP COLUMN tool"
    )
    assert (
        t.rename_column_sql("tool", "tool_name")
        == "ALTER TABLE cat.db.transcripts RENAME COLUMN tool TO tool_name"
    )
    for bad in ("conv_id", "turn_idx", "ts", "lsn"):
        with pytest.raises(ValueError):
            t.drop_column_sql(bad)
        with pytest.raises(ValueError):
            t.rename_column_sql(bad, "x")


def test_negative_epoch_ids_never_silently_committed(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    # fresh table: a negative id must NOT read as committed (the old
    # `n <= watermark(default -1)` check said True and dropped the batch)
    assert not tbl.is_epoch_committed(-1)
    assert not tbl.is_epoch_committed("ns:-5")
    # and the fold must keep negative ids as opaque extras, not discard them
    rest, wm = _fold_epochs({"-3", "0", "1"}, {})
    assert rest == ["-3"] and wm == {"": 1}


def test_iceberg_ref_builders_encode_the_contract():
    # tags / branches / fast-forward map the parquet backend's named refs
    # and clone+fast_forward workflow onto Iceberg's native ref DDL
    t = object.__new__(IcebergTable)
    t.identifier = "cat.db.transcripts"
    t._key = ("conv_id", "turn_idx")
    t._order = ("ts", "lsn")
    t._n_buckets = 16

    assert (
        t.tag_sql("audited-2024-06")
        == "ALTER TABLE cat.db.transcripts CREATE TAG `audited-2024-06`"
    )
    assert "AS OF VERSION 7" in t.tag_sql("r7", version=7)
    assert t.delete_tag_sql("r7") == "ALTER TABLE cat.db.transcripts DROP TAG `r7`"
    assert (
        t.create_branch_sql("backfill")
        == "ALTER TABLE cat.db.transcripts CREATE BRANCH `backfill`"
    )
    ff = t.fast_forward_sql("backfill")
    assert ff == (
        "CALL cat.system.fast_forward(table => 'db.transcripts', "
        "branch => 'main', to => 'backfill')"
    )
    # 2-part identifier falls back to the session catalog
    t2 = object.__new__(IcebergTable)
    t2.identifier = "db.transcripts"
    assert "CALL spark_catalog.system.fast_forward" in t2.fast_forward_sql("b")


def test_iceberg_maintenance_builders_encode_the_contract():
    # clustering / expiry / timestamp travel map compact(cluster_files=…),
    # vacuum(older_than_secs=…) and at_timestamp onto Iceberg's native DDL
    t = object.__new__(IcebergTable)
    t.identifier = "cat.db.transcripts"
    t._key = ("conv_id", "turn_idx")
    t._order = ("ts", "lsn")
    t._n_buckets = 16

    assert (
        t.sort_order_sql()
        == "ALTER TABLE cat.db.transcripts WRITE ORDERED BY ts"
    )
    rw = t.rewrite_data_files_sql(where="ts >= TIMESTAMP '2024-06-01'")
    assert rw.startswith("CALL cat.system.rewrite_data_files(")
    assert "strategy => 'sort'" in rw and "where => 'ts >= " in rw
    exp = t.expire_snapshots_sql(older_than_secs=86400, retain_last=3)
    assert "CALL cat.system.expire_snapshots(" in exp
    assert "retain_last => 3" in exp and "older_than => TIMESTAMP '" in exp
    sel = t.select_at_timestamp_sql("2024-06-01 12:00:00")
    assert "TIMESTAMP AS OF '2024-06-01 12:00:00'" in sel
    assert "NOT coalesce(_tombstone, false)" in sel
    # inspection metadata tables map onto Iceberg's native ones
    assert "FROM cat.db.transcripts.files" in t.files_sql()
    assert "record_count AS records" in t.files_sql()
    assert "FROM cat.db.transcripts.partitions" in t.partitions_sql()


def test_iceberg_update_builder_encodes_the_contract():
    t = object.__new__(IcebergTable)
    t.identifier = "cat.db.transcripts"
    t._key = ("conv_id", "turn_idx")
    t._order = ("ts", "lsn")
    t._n_buckets = 16

    sql = t.update_sql("role = 'user'", {"text": "upper(text)"})
    assert sql.startswith("UPDATE cat.db.transcripts SET text = upper(text)")
    # only live rows: tombstones are not updatable state
    assert "NOT coalesce(_tombstone, false)" in sql
    import pytest

    with pytest.raises(ValueError, match="key/LWW-order"):
        t.update_sql("true", {"conv_id": "'x'"})
    with pytest.raises(ValueError, match="empty"):
        t.update_sql("true", {})
    # native SPJ confs: the catalog form of colocated_join
    conf = IcebergTable.spj_conf()
    assert conf["spark.sql.sources.v2.bucketing.enabled"] == "true"
    assert conf["spark.sql.autoBroadcastJoinThreshold"] == "-1"


def test_iceberg_changelog_view_builder_encodes_the_contract():
    t = object.__new__(IcebergTable)
    t.identifier = "cat.db.transcripts"
    t._key = ("conv_id", "turn_idx")
    t._order = ("ts", "lsn")
    t._n_buckets = 16

    sql = t.create_changelog_view_sql(start_snapshot_id=7, end_snapshot_id=9)
    assert sql.startswith("CALL cat.system.create_changelog_view(")
    assert "table => 'db.transcripts'" in sql
    assert "map('start-snapshot-id', '7', 'end-snapshot-id', '9')" in sql
    # compute_updates pairs INSERT/DELETE into UPDATE_BEFORE/UPDATE_AFTER
    # on the MERGE key — the catalog form of preimages=True
    assert "identifier_columns => array('conv_id', 'turn_idx')" in sql
    assert "compute_updates => true" in sql
    raw = t.create_changelog_view_sql(compute_updates=False)
    assert "compute_updates" not in raw and "options" not in raw

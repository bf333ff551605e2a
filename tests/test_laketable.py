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

    sql = t.merge_sql("chg", ["role", "text", "tool", "ts", "lsn"])
    assert "MERGE INTO cat.db.transcripts t" in sql
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # the lexicographic (ts, lsn) LWW guard
    assert "(s.ts > t.ts OR t.ts = s.ts AND s.lsn > t.lsn)" in sql
    assert "WHEN MATCHED AND s.op = 'delete'" in sql and "THEN DELETE" in sql
    assert "WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT" in sql

    create = IcebergTable.create_sql(
        "cat.db.transcripts", "conv_id string, turn_idx int", n_buckets=8
    )
    assert "PARTITIONED BY (bucket(8, conv_id))" in create
    assert "'write.merge.mode'='merge-on-read'" in create

    probe = t.epoch_committed_sql(7)
    assert "cat.db.transcripts.snapshots" in probe  # metadata-only, no scan


def test_negative_epoch_ids_never_silently_committed(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    # fresh table: a negative id must NOT read as committed (the old
    # `n <= watermark(default -1)` check said True and dropped the batch)
    assert not tbl.is_epoch_committed(-1)
    assert not tbl.is_epoch_committed("ns:-5")
    # and the fold must keep negative ids as opaque extras, not discard them
    rest, wm = _fold_epochs({"-3", "0", "1"}, {})
    assert rest == ["-3"] and wm == {"": 1}

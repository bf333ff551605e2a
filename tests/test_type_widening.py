"""Opt-in lossless type widening on schema evolution (Delta/Iceberg "type
widening" analog): a long-lived CDC table whose source ALTERs a column
(MySQL INT → BIGINT) must keep ingesting without a table rewrite. Old
parquet files keep their narrow types; Spark's parquet reader upcasts at
scan time (probed on this version — this test is the regression pin)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from mas_scada_bulkingest_spark.lake import SnapshotTable
from mas_scada_bulkingest_spark.operators.schema_evolution import merge_schemas
from mas_scada_bulkingest_spark.pipeline import apply_changes
from mas_scada_bulkingest_spark.schemas import TRANSCRIPT_SCHEMA

NARROW = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp_ntz, score int, weight float"
)
WIDE = NARROW.replace("score int", "score long").replace(
    "weight float", "weight double"
)


def test_merge_schemas_widening_lattice(spark):  # fromDDL needs a session
    s = lambda ddl: T.StructType.fromDDL(ddl)
    out = merge_schemas(s("a int"), s("a long"), allow_widening=True)
    assert out["a"].dataType == T.LongType()
    # either direction: a NARROWER incoming batch keeps the wide type
    out = merge_schemas(s("a long"), s("a int"), allow_widening=True)
    assert out["a"].dataType == T.LongType()
    out = merge_schemas(s("a float"), s("a double"), allow_widening=True)
    assert out["a"].dataType == T.DoubleType()
    out = merge_schemas(s("a int"), s("a double"), allow_widening=True)
    assert out["a"].dataType == T.DoubleType()
    # lossy promotions stay rejected even when widening is on
    with pytest.raises(TypeError, match="not a lossless widening"):
        merge_schemas(s("a long"), s("a double"), allow_widening=True)
    with pytest.raises(TypeError, match="not a lossless widening"):
        merge_schemas(s("a string"), s("a long"), allow_widening=True)
    # default stays strict
    with pytest.raises(TypeError, match="rejected"):
        merge_schemas(s("a int"), s("a long"))


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_widened_replay_upcasts_old_files(spark, tmpdir_path, mode):
    tbl = SnapshotTable.create(
        spark, tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=4,
        mode=mode, type_widening=True,
    )
    t = datetime(2024, 1, 1)
    early = spark.createDataFrame(
        [(1, "insert", "conv-1", 0, "user", "a", None, t, 7, 0.5),
         (2, "insert", "conv-2", 0, "user", "b", None, t, 8, 1.5)],
        NARROW,
    )
    apply_changes(tbl, early, epoch_id=0, auto_compact_files=None)
    assert tbl.schema["score"].dataType == T.IntegerType()

    big = 2**40  # beyond int32: only valid post-widening
    late = spark.createDataFrame(
        [(3, "insert", "conv-3", 0, "user", "c", None, t, big, 2.5),
         (4, "update", "conv-1", 0, "user", "a2", None, t, big + 1, 3.5)],
        WIDE,
    )
    apply_changes(tbl, late, epoch_id=1)
    assert tbl.schema["score"].dataType == T.LongType()
    assert tbl.schema["weight"].dataType == T.DoubleType()

    got = {
        r["conv_id"]: (r["score"], r["weight"])
        for r in tbl.read().collect()
    }
    # pre-widening rows (narrow files) upcast at scan; new rows exact
    assert got == {
        "conv-1": (big + 1, 3.5),
        "conv-2": (8, 1.5),
        "conv-3": (big, 2.5),
    }

    # a NARROW batch after widening still merges (casts up, schema stable)
    later = spark.createDataFrame(
        [(9, "update", "conv-2", 0, "user", "b2", None, t, 9, 4.5)], NARROW
    )
    apply_changes(tbl, later, epoch_id=2)
    assert tbl.schema["score"].dataType == T.LongType()
    row = tbl.lookup("conv-2", 0).first()
    assert (row["score"], row["weight"]) == (9, 4.5)


def test_strict_table_rejects_retyping(spark, tmpdir_path):
    tbl = SnapshotTable.create(
        spark, tmpdir_path + "/t", TRANSCRIPT_SCHEMA, n_buckets=2
    )
    t = datetime(2024, 1, 1)
    apply_changes(
        tbl,
        spark.createDataFrame(
            [(1, "insert", "conv-1", 0, "u", "a", None, t, 7)],
            NARROW.replace(", weight float", ""),
        ),
        epoch_id=0,
    )
    with pytest.raises(TypeError, match="rejected"):
        apply_changes(
            tbl,
            spark.createDataFrame(
                [(2, "update", "conv-1", 0, "u", "a2", None, t, 2**40)],
                WIDE.replace(", weight double", ""),
            ),
            epoch_id=1,
        )

"""Schema-evolution policy (strict vs additive — Delta's mergeSchema
governance: Delta's DEFAULT rejects unknown writer columns; this engine's
historical behavior is additive, so the policy is per-table and flippable).

Contracts pinned here: strict rejects a batch carrying an unknown column
BEFORE anything is written or committed (the epoch stays replayable after
fixing); additive (default) evolves as before; the policy never
false-triggers on rename-lagging batches (canonicalized first), batches
still carrying a drop_column'd name (registry-filtered), engine helper
columns, or generated columns; bootstrap enforces the same policy; the
setter flips both ways mid-life; clone carries and restore adopts.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.lake import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _row(lsn, conv, turn):
    return (
        lsn, "update", conv, turn, "u", "x", None,
        datetime(2024, 1, 1, 0, 0, 0, lsn),
    )


def test_strict_rejects_unknown_column(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/ts", n_buckets=2)
    assert tbl.schema_evolution == "additive"
    tbl.set_schema_evolution("strict")
    assert tbl.schema_evolution == "strict"
    ok = spark.createDataFrame([_row(1, "c1", 1)], _COLS)
    apply_changes(tbl, ok, epoch_id=0)
    evolved = spark.createDataFrame([_row(2, "c2", 2)], _COLS).selectExpr(
        "*", "'{}' AS metadata"
    )
    with pytest.raises(ValueError, match="strict schema evolution"):
        apply_changes(tbl, evolved, epoch_id=1)
    # nothing committed; the epoch is replayable after fixing
    assert not tbl.is_epoch_committed(1)
    assert "metadata" not in tbl.schema.fieldNames()
    st = apply_changes(tbl, evolved.drop("metadata"), epoch_id=1)
    assert st.applied == 1
    # flip back: the same evolved batch now admits the column
    tbl.set_schema_evolution("additive")
    apply_changes(
        tbl,
        spark.createDataFrame([_row(3, "c3", 3)], _COLS).selectExpr(
            "*", "'{}' AS metadata"
        ),
        epoch_id=2,
    )
    assert "metadata" in tbl.schema.fieldNames()
    with pytest.raises(ValueError, match="policy"):
        tbl.set_schema_evolution("locked")


def test_strict_no_false_triggers(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tn", n_buckets=2)
    apply_changes(
        tbl, spark.createDataFrame([_row(1, "c1", 1)], _COLS), epoch_id=0
    )
    tbl.rename_column("tool", "tool_name")
    tbl.drop_column("text")
    tbl.set_schema_evolution("strict")
    # a lagging batch using the OLD name of a renamed column, and still
    # carrying a DROPPED column, is canonicalized/filtered before the
    # policy check — neither may reject the epoch
    lag = spark.createDataFrame([_row(2, "c2", 2)], _COLS)  # has tool+text
    st = apply_changes(tbl, lag, epoch_id=1)
    assert st.applied == 1
    assert tbl.read().count() == 2


def test_strict_bootstrap_and_clone_restore(spark, tmpdir_path):
    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp_ntz, lsn long"
    )
    tbl = SnapshotTable.create(
        spark, tmpdir_path + "/tb",
        spark.createDataFrame([], schema).schema,
        n_buckets=2, schema_evolution="strict",
    )
    dump = spark.createDataFrame(
        [("a", 1, "u", "x", None, datetime(2024, 1, 1), 1)], schema
    ).selectExpr("*", "42 AS rogue")
    with pytest.raises(ValueError, match="strict schema evolution"):
        tbl.bootstrap(dump)
    tbl.bootstrap(dump.drop("rogue"))
    assert tbl.read().count() == 1
    v_strict = tbl._snapshot["version"]
    clone = tbl.clone(tmpdir_path + "/tb_clone")
    assert clone.schema_evolution == "strict"
    tbl.set_schema_evolution("additive")
    tbl.restore(v_strict)
    assert tbl.schema_evolution == "strict"
    with pytest.raises(ValueError):
        SnapshotTable.create(
            spark, tmpdir_path + "/bad",
            spark.createDataFrame([], schema).schema,
            schema_evolution="locked",
        )

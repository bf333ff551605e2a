"""Generated columns (add_generated_column — the Delta GENERATED ALWAYS AS
analog; reference's nearest relative is constant-column injection, SURVEY
§2 P3).

Contracts pinned here: declaration requires an EMPTY table (Delta parity —
every stored row satisfies the expression by construction); a batch
omitting the column gets it computed at the merge/bootstrap boundary; a
batch supplying it is validated by the implicit fail-mode ``gen_<name>``
constraint (NULL-safe ``<=>`` — mismatch aborts the epoch pre-commit);
source columns the batch lacks enter the expression as typed NULLs on both
the generation and validation sides; drop_column on the generated column
retires expression + implicit constraint together while drop_constraint
alone refuses; drop/rename of a column REFERENCED by any constraint or
generation expression refuses (a metadata-only schema change must never
strand an expression later merges fail to compile); clone carries the
registry, restore adopts the target's.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from mas_scada_bulkingest_spark.lake import (
    ConstraintViolationError,
    SnapshotTable,
)
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _row(lsn, conv, turn, op="update", text="hello"):
    payload_none = op == "delete"
    return (
        lsn,
        op,
        conv,
        turn,
        None if payload_none else "u",
        None if payload_none else text,
        None,
        datetime(2024, 1, 2, 0, 0, lsn % 60, lsn),
    )


def test_generation_computes_and_validates(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tg", n_buckets=2)
    tbl.add_generated_column("text_len", "length(text)")
    tbl.add_generated_column("ts_day", "CAST(ts AS DATE)")
    assert sorted(tbl.generated_columns) == ["text_len", "ts_day"]
    assert "text_len" in tbl.schema.fieldNames()
    assert sorted(tbl.constraints) == ["gen_text_len", "gen_ts_day"]

    # batch omits both -> computed map-side; delete rows flow through
    batch = spark.createDataFrame(
        [_row(1, "c1", 1, text="abc"), _row(2, "c2", 2, op="delete")],
        _COLS,
    )
    st = apply_changes(tbl, batch, epoch_id=0)
    assert st.violations == {"gen_text_len": 0, "gen_ts_day": 0}
    rows = {r.conv_id: r for r in tbl.read().collect()}
    assert rows["c1"].text_len == 3
    assert rows["c1"].ts_day == date(2024, 1, 2)
    assert "c2" not in rows

    # supplying a MATCHING value passes
    ok = spark.createDataFrame(
        [_row(3, "c3", 3, text="xy")], _COLS
    ).selectExpr("*", "CAST(2 AS INT) AS text_len")
    apply_changes(tbl, ok, epoch_id=1)
    assert tbl.read().filter("conv_id = 'c3'").first().text_len == 2

    # supplying a MISMATCHED value aborts the epoch (Delta rejects writes
    # contradicting the generation expression)
    bad = spark.createDataFrame(
        [_row(4, "c4", 4, text="xy")], _COLS
    ).selectExpr("*", "CAST(99 AS INT) AS text_len")
    with pytest.raises(ConstraintViolationError) as ei:
        apply_changes(tbl, bad, epoch_id=2)
    assert ei.value.violations == {"gen_text_len": 1}
    assert not tbl.is_epoch_committed(2)
    # fix upstream (just omit the column), replay the same epoch id
    st = apply_changes(
        tbl, spark.createDataFrame([_row(4, "c4", 4, text="xy")], _COLS),
        epoch_id=2,
    )
    assert st.applied == 1 and tbl.read().count() == 3


def test_generation_over_lagging_source_column(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tl", n_buckets=2)
    tbl.add_generated_column("tool_uc", "upper(tool)")
    # the batch does not carry `tool` at all: generation sees a typed NULL
    # on BOTH the compute and validation sides -> NULL, no violation
    lag = spark.createDataFrame(
        [(1, "update", "c1", 1, "u", "x", datetime(2024, 1, 1, 0, 0, 0, 1))],
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, ts timestamp_ntz",
    )
    st = apply_changes(tbl, lag, epoch_id=0)
    assert st.violations == {"gen_tool_uc": 0}
    r = tbl.read().first()
    assert r.tool_uc is None and r.tool is None


def test_declaration_guards(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/td", n_buckets=2)
    with pytest.raises(ValueError, match="does not resolve"):
        tbl.add_generated_column("bad", "length(no_such)")
    with pytest.raises(ValueError, match="invalid column name"):
        tbl.add_generated_column("_sneaky", "1")
    with pytest.raises(ValueError, match="exists"):
        tbl.add_generated_column("text", "upper(text)")
    apply_changes(
        tbl, spark.createDataFrame([_row(1, "c1", 1)], _COLS), epoch_id=0
    )
    with pytest.raises(ValueError, match="empty table"):
        tbl.add_generated_column("late", "length(text)")


def test_drop_rename_reference_guards(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tr", n_buckets=2)
    tbl.add_generated_column("text_len", "length(text)")
    tbl.add_constraint("short", "length(role) < 100", mode="warn")
    # the implicit validation constraint cannot be dropped alone
    with pytest.raises(ValueError, match="implicit validation"):
        tbl.drop_constraint("gen_text_len")
    # a column referenced by a generation expr cannot be dropped/renamed
    with pytest.raises(ValueError, match="referenced by"):
        tbl.drop_column("text")
    with pytest.raises(ValueError, match="referenced by"):
        tbl.rename_column("text", "body")
    # a column referenced by a plain constraint cannot be dropped either
    with pytest.raises(ValueError, match="referenced by"):
        tbl.drop_column("role")
    # the generated column itself cannot be renamed (name-bound exprs)...
    with pytest.raises(ValueError, match="generated column"):
        tbl.rename_column("text_len", "n_chars")
    # ...but dropping it retires expression + implicit constraint together
    tbl.drop_column("text_len")
    assert tbl.generated_columns == {}
    assert sorted(tbl.constraints) == ["short"]
    tbl.drop_constraint("short")
    tbl.drop_column("role")  # unreferenced now -> allowed


def test_clone_restore_and_bootstrap(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/tc", n_buckets=2)
    v_gen = tbl.add_generated_column("text_len", "length(text)")
    apply_changes(
        tbl, spark.createDataFrame([_row(1, "c1", 1, text="abcd")], _COLS),
        epoch_id=0,
    )
    clone = tbl.clone(tmpdir_path + "/tc_clone")
    assert clone.generated_columns == {"text_len": "length(text)"}
    bad = spark.createDataFrame(
        [_row(9, "c9", 9, text="xy")], _COLS
    ).selectExpr("*", "CAST(99 AS INT) AS text_len")
    with pytest.raises(ConstraintViolationError):
        apply_changes(clone, bad, epoch_id=100)
    # restore back to the declaration version re-adopts the registry
    assert tbl.restore(v_gen) > v_gen
    assert tbl.generated_columns == {"text_len": "length(text)"}

    # bootstrap generates too (the bulk-load phase honors the contract)
    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp_ntz, lsn long"
    )
    t2 = SnapshotTable.create(
        spark, tmpdir_path + "/tb",
        spark.createDataFrame([], schema).schema, n_buckets=2,
    )
    t2.add_generated_column("text_len", "length(text)")
    dump = spark.createDataFrame(
        [("a", 1, "u", "four", None, datetime(2024, 1, 1), 1)], schema
    )
    st = t2.bootstrap(dump)
    assert st.applied == 1
    assert t2.read().first().text_len == 4

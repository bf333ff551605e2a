"""Predicate update (``update_where``) — Delta ``UPDATE … SET … WHERE``.

The contract under test: patched rows keep their OWN (ts, lsn), so a
verbatim stale re-delivery of the updated version must keep losing (the
MoR read collapse's ``_patched`` tie-break; CoW's strict merge
comparison), a later patch must beat an earlier one, a delete must beat
any patch, and any genuinely NEWER upstream change must beat the patch —
including after ``compact()`` folded the patch layer.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mas_scada_bulkingest_spark.lake.snapshot_table import (
    ConstraintViolationError,
    SnapshotTable,
)
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
)

CH = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, CH)


def _state(tbl):
    return {
        (r.conv_id, r.turn_idx): r.text for r in tbl.read().collect()
    }


def _seed(spark, path, mode):
    tbl = create_transcripts_table(spark, path, n_buckets=4, mode=mode)
    apply_changes(
        tbl,
        _mk(
            spark,
            [
                (1, "insert", "a", 0, "user", "hello", None, _t(1)),
                (2, "insert", "a", 1, "asst", "world", None, _t(2)),
                (3, "insert", "b", 0, "user", "xyz", None, _t(3)),
            ],
        ),
        0,
    )
    return tbl


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_update_and_late_data_semantics(spark, tmpdir_path, mode):
    tbl = _seed(spark, tmpdir_path + "/t", mode)
    assert tbl.update_where("role = 'user'", {"text": "upper(text)"}) == 2
    assert _state(tbl) == {
        ("a", 0): "HELLO",
        ("a", 1): "world",
        ("b", 0): "XYZ",
    }
    # verbatim stale re-delivery of the updated version keeps losing
    apply_changes(
        tbl,
        _mk(spark, [(1, "insert", "a", 0, "user", "hello", None, _t(1))]),
        1,
    )
    assert _state(tbl)[("a", 0)] == "HELLO"
    # a genuinely newer upstream change overwrites the patch
    apply_changes(
        tbl,
        _mk(spark, [(9, "insert", "a", 0, "user", "newer", None, _t(9))]),
        2,
    )
    assert _state(tbl)[("a", 0)] == "newer"
    # second patch supersedes the first
    tbl.update_where("conv_id = 'b'", {"text": "'p1'"})
    tbl.update_where("conv_id = 'b'", {"text": "'p2'"})
    assert _state(tbl)[("b", 0)] == "p2"
    # delete beats every patch layer
    tbl.delete_where("conv_id = 'b'")
    assert ("b", 0) not in _state(tbl)
    # no-match predicate: 0, state unchanged
    before = _state(tbl)
    assert tbl.update_where("turn_idx = 99", {"text": "'x'"}) == 0
    assert _state(tbl) == before


def test_mor_patch_survives_compaction(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    tbl.update_where("conv_id = 'a' AND turn_idx = 0", {"text": "'patched'"})
    assert tbl.compact(max_files=0) > 0
    # the compacted winner keeps its patch seq: a stale re-delivery
    # arriving AFTER compaction must still lose
    apply_changes(
        tbl,
        _mk(spark, [(1, "insert", "a", 0, "user", "hello", None, _t(1))]),
        5,
    )
    assert _state(tbl)[("a", 0)] == "patched"


def test_mor_append_only_and_feed_invariance(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    before_files = {
        b: list(fs) for b, fs in tbl._snapshot["buckets"].items()
    }
    feed_before = sorted(
        map(tuple, tbl.read_changes(0).collect()), key=str
    )
    tbl.update_where("role = 'user'", {"text": "upper(text)"})
    # strict append: every pre-update file list is a prefix of the new one
    after_files = tbl._snapshot["buckets"]
    for b, fs in before_files.items():
        assert after_files[b][: len(fs)] == fs
    # maintenance op: the changes feed does not emit patches
    assert (
        sorted(map(tuple, tbl.read_changes(0).collect()), key=str)
        == feed_before
    )
    # files() tags the patch layer as a delta with update_where origin
    origins = {
        r.origin for r in tbl.files().collect() if r.origin == "updatewhere"
    }
    assert origins == {"updatewhere"}
    assert tbl.history().filter(
        F.col("operation") == "update_where"
    ).count() == 1


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_time_travel_below_update(spark, tmpdir_path, mode):
    tbl = _seed(spark, tmpdir_path + "/t", mode)
    v = tbl._snapshot["version"]
    tbl.update_where("conv_id = 'a'", {"text": "'patched'"})
    assert _state(tbl)[("a", 0)] == "patched"
    old = {
        (r.conv_id, r.turn_idx): r.text
        for r in tbl.at_version(v).read().collect()
    }
    assert old[("a", 0)] == "hello"


def test_update_semantics_swap_and_old_row_context(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    # both RHS evaluate against the PRE-update row: swap must not chain
    tbl.update_where(
        "conv_id = 'a' AND turn_idx = 0", {"text": "role", "role": "text"}
    )
    row = (
        tbl.read()
        .filter("conv_id = 'a' AND turn_idx = 0")
        .select("role", "text")
        .first()
    )
    assert (row.role, row.text) == ("hello", "user")


def test_validation_errors(spark, tmpdir_path):
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    with pytest.raises(ValueError, match="key/LWW-order"):
        tbl.update_where("true", {"conv_id": "'x'"})
    with pytest.raises(ValueError, match="key/LWW-order"):
        tbl.update_where("true", {"lsn": "lsn + 1"})
    with pytest.raises(ValueError, match="unknown column"):
        tbl.update_where("true", {"nope": "'x'"})
    with pytest.raises(ValueError, match="does not resolve"):
        tbl.update_where("nope = 1", {"text": "'x'"})
    with pytest.raises(ValueError, match="does not resolve"):
        tbl.update_where("true", {"text": "no_such_col || 'x'"})
    with pytest.raises(ValueError, match="empty assignment"):
        tbl.update_where("true", {})


def test_generated_columns_recompute_and_refuse(spark, tmpdir_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tbl = SnapshotTable.create(
        spark, tmpdir_path + "/g", schema, n_buckets=4, mode="mor"
    )
    tbl.add_generated_column("text_len", "length(text)")
    batch = spark.createDataFrame(
        [("a", 0, "hello", _t(1), 1)],
        "conv_id string, turn_idx int, text string,"
        " ts timestamp_ntz, lsn long",
    ).withColumn("op", F.lit("insert"))
    apply_changes(tbl, batch, 0)
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        tbl.update_where("true", {"text_len": "99"})
    tbl.update_where("conv_id = 'a'", {"text": "'longer text'"})
    row = tbl.read().first()
    assert (row.text, row.text_len) == ("longer text", 11)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_constraints_enforced_in_fail_mode(spark, tmpdir_path, mode):
    tbl = _seed(spark, tmpdir_path + "/t", mode)
    tbl.add_constraint("text_nonempty", "length(text) > 0", mode="warn")
    before = _state(tbl)
    with pytest.raises(ConstraintViolationError):
        tbl.update_where("conv_id = 'a'", {"text": "''"})
    # nothing committed: state unchanged, no update_where in history
    assert _state(tbl) == before
    assert tbl.history().filter(
        F.col("operation") == "update_where"
    ).count() == 0


def test_modes_agree(spark, tmpdir_path):
    mor = _seed(spark, tmpdir_path + "/m", "mor")
    cow = _seed(spark, tmpdir_path + "/c", "cow")
    for tbl in (mor, cow):
        tbl.update_where("role = 'user'", {"text": "upper(text)"})
        apply_changes(
            tbl,
            _mk(
                spark,
                [
                    (1, "insert", "a", 0, "user", "hello", None, _t(1)),
                    (7, "insert", "b", 0, "user", "fresh", None, _t(7)),
                ],
            ),
            1,
        )
    assert _state(mor) == _state(cow)


def test_never_patched_tables_pay_zero(spark, tmpdir_path):
    """The _patched order key is armed by the first update_where commit
    (snapshot flag) — a table that never patches has NO _patched column in
    its pinned scan schema, no widened collapse struct, and its compacted
    files never carry the column."""
    tbl = _seed(spark, tmpdir_path + "/t", "mor")
    assert not tbl._has_patches
    assert "_patched" not in [f.name for f in tbl._storage_schema().fields]
    tbl.compact(max_files=0)
    import pyarrow.parquet as pq
    import os

    files = [
        os.path.join(tbl.path, f)
        for fs in tbl._snapshot["buckets"].values()
        for f in fs
    ]
    assert all(
        "_patched" not in pq.ParquetFile(f).schema_arrow.names for f in files
    )
    # first patch arms the flag; it survives compaction and a clone
    tbl.update_where("conv_id = 'a'", {"text": "'p'"})
    assert tbl._has_patches
    assert "_patched" in [f.name for f in tbl._storage_schema().fields]
    tbl.compact(max_files=0)
    assert tbl._has_patches
    clone = tbl.clone(tmpdir_path + "/c")
    assert clone._has_patches


def test_racing_patches_resolve_in_commit_order(spark, tmpdir_path):
    """Two MoR instances race update_where from the SAME base snapshot.
    The loser's CAS retry must re-derive the patch against the refreshed
    snapshot (ADVICE r4): its _patched seq lands strictly above the
    winner's, so the surviving value is COMMIT-ordered — and its RHS
    evaluates against the first patch's output (standard sequential
    UPDATE semantics), not against the stale base row."""
    a = _seed(spark, tmpdir_path + "/t", "mor")
    b = SnapshotTable(spark, tmpdir_path + "/t")  # same base snapshot
    assert a.update_where("conv_id = 'a'", {"text": "'first'"}) == 2
    # b's snapshot predates a's commit -> CAS fails once, rebases, rederives
    assert b.update_where("conv_id = 'a'", {"text": "upper(text)"}) == 2
    for inst in (a, b):
        st = _state(SnapshotTable(spark, tmpdir_path + "/t"))
        assert st[("a", 0)] == "FIRST"  # upper() of the FIRST patch's value
        assert st[("a", 1)] == "FIRST"
    # the rebased patch carries a strictly higher seq than the winner's
    raw = b._read_collapsed_local(with_bucket_col=False)
    seqs = [
        r["_patched"]
        for r in raw.filter(F.col("conv_id") == "a").collect()
    ]
    assert max(seqs) == 2


def test_rebase_rederives_affected_set(spark, tmpdir_path):
    """If the concurrent commit DELETED every row the stale instance
    matched, the rebase must return 0 instead of patching ghosts."""
    a = _seed(spark, tmpdir_path + "/t", "mor")
    b = SnapshotTable(spark, tmpdir_path + "/t")
    a.delete_where("conv_id = 'b'")
    assert b.update_where("conv_id = 'b'", {"text": "'ghost'"}) == 0
    assert ("b", 0) not in _state(SnapshotTable(spark, tmpdir_path + "/t"))

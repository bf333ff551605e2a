"""Golden-SQL contract corpus for the IcebergTable builders (VERDICT r4
item 3).

``lake/iceberg.py`` is ~540 lines of generated DDL/MERGE/CALL text that has
never run against a live catalog (no Iceberg jars in this sandbox). These
tests pin every pure builder's output for one canonical table configuration
to checked-in files under ``tests/golden_iceberg/`` — semantic drift in the
generated SQL becomes a reviewable git diff instead of a silent change —
and assert the ADVICE-fixed invariants directly against the TEXT:

* epoch key symmetry: the summary key the commit conf stamps is the SAME
  key every metadata probe reads back;
* underscore-helper stripping: ``_max_lsn`` (and friends) from
  ``collapse_lww(track_max_of=…)`` never reach the MERGE text;
* tombstone round-trip: deletes persist as ``_tombstone=true`` rows
  carrying their order tuple, every read/time-travel surface filters them,
  and the purge builder is the only DELETE.

Regenerate intentionally with ``python tools/gen_iceberg_golden.py``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from gen_iceberg_golden import (  # noqa: E402
    GOLDEN_DIR,
    VALUE_COLS,
    build_corpus,
    _table,
)


@pytest.fixture(scope="module")
def corpus():
    return build_corpus()


def test_corpus_matches_golden_files(corpus):
    missing, drifted = [], []
    for name, text in corpus.items():
        path = os.path.join(GOLDEN_DIR, f"{name}.sql")
        if not os.path.exists(path):
            missing.append(name)
            continue
        with open(path) as f:
            golden = f.read().rstrip("\n")
        if golden != text.rstrip("\n"):
            drifted.append(name)
    assert not missing, (
        f"golden files missing for {missing}; run "
        "`python tools/gen_iceberg_golden.py` and review the diff"
    )
    assert not drifted, (
        f"generated SQL drifted from golden corpus: {drifted}; if the "
        "change is intentional run `python tools/gen_iceberg_golden.py` "
        "and review `git diff tests/golden_iceberg/`"
    )


def test_no_stale_golden_files(corpus):
    on_disk = {
        fn[: -len(".sql")]
        for fn in os.listdir(GOLDEN_DIR)
        if fn.endswith(".sql")
    }
    assert on_disk == set(corpus), (
        "golden dir out of sync with the builder inventory: "
        f"stale={sorted(on_disk - set(corpus))} "
        f"missing={sorted(set(corpus) - on_disk)}"
    )


def test_epoch_key_symmetry(corpus):
    """The conf key that stamps the epoch id into the MERGE's own snapshot
    summary must be the SAME summary key every probe reads back (ADVICE
    r3/r4 fix — an asymmetric key would commit markers nobody can find)."""
    prop = "engine.epoch-id"
    assert corpus["epoch_commit_conf"].startswith(
        f"SET spark.sql.iceberg.snapshot-property.{prop} = "
    )
    assert f"summary['{prop}']" in corpus["epoch_committed_probe"]
    assert f"summary['{prop}']" in corpus["epoch_snapshots_range"]
    assert f"summary['{prop}']" in corpus["epoch_snapshots_open"]


def test_merge_strips_underscore_helpers(corpus):
    """collapse_lww(track_max_of=…) helper columns must not leak into the
    table (ADVICE r3 fix)."""
    assert "_max_lsn" in VALUE_COLS  # the fixture feeds the helper in
    assert "_max_lsn" not in corpus["merge_epoch"]


def test_tombstone_round_trip(corpus):
    """Deletes persist as tombstone rows with their order tuple (ADVICE r3
    fix): the MERGE writes the flag on BOTH branches, never a physical
    THEN DELETE; reads filter it; only the purge builder deletes."""
    m = corpus["merge_epoch"]
    assert "t._tombstone = (s.op = 'delete')" in m
    assert "_tombstone" in corpus["create_table"]
    # insert branch carries the flag too (a delete for an unseen key must
    # land as a tombstone, not vanish)
    insert_clause = m.split("WHEN NOT MATCHED")[1]
    assert "_tombstone" in insert_clause and "(s.op = 'delete')" in insert_clause
    assert "THEN DELETE" not in m
    for read_surface in ("select_at_timestamp", "update_where"):
        assert "NOT coalesce(_tombstone, false)" in corpus[read_surface]
    assert corpus["purge_tombstones"].startswith("DELETE FROM")
    assert "_tombstone" in corpus["purge_tombstones"]
    # horizon form keeps the null-safe guard
    assert "lsn IS NOT NULL" in corpus["purge_tombstones_horizon"]


def test_merge_lww_guard_is_strict(corpus):
    """Equal-order re-deliveries must LOSE (idempotent replay): the
    matched-branch guard is a strict lexicographic (ts, lsn) comparison."""
    m = corpus["merge_epoch"]
    assert "WHEN MATCHED AND (s.ts > t.ts OR t.ts = s.ts AND s.lsn > t.lsn)" in m


def test_update_sql_validates_known_columns():
    t = _table()
    with pytest.raises(ValueError, match="unknown column"):
        t.update_sql(
            "turn_idx = 5",
            {"txet": "'typo'"},
            known_columns=["conv_id", "turn_idx", "text"],
        )
    # without known_columns the builder is schema-free (documented
    # asymmetry): the same call builds text that fails only at the catalog
    assert "txet" in t.update_sql("turn_idx = 5", {"txet": "'typo'"})
    with pytest.raises(ValueError, match="key/LWW-order"):
        t.update_sql("1=1", {"ts": "NULL"}, known_columns=["ts"])


def test_scoped_rewrite_escapes_embedded_quotes():
    """A scoped rewrite's `where` routinely carries TIMESTAMP '…' literals;
    embedded quotes must be doubled inside the single-quoted procedure
    argument or the CALL is unparseable at the catalog (r5 review fix)."""
    t = _table()
    sql = t.rewrite_data_files_sql(where="ts < TIMESTAMP '2024-06-01 00:00:00'")
    assert "where => 'ts < TIMESTAMP ''2024-06-01 00:00:00'''" in sql
    # an argument with no quotes passes through verbatim
    assert "where => 'turn_idx = 5'" in t.rewrite_data_files_sql(where="turn_idx = 5")

"""Property-based check: engine final state == oracle for arbitrary logs.

Hypothesis generates small adversarial change logs (duplicate lsns across
deliveries, ts ties, interleaved deletes, multi-epoch splits at arbitrary
points); the engine's epoch-batched MERGE must agree with the single-threaded
pandas reducer on every one. Mirrors SURVEY.md §5(b) at property scale.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mas_scada_bulkingest_spark.oracle import reduce_changelog
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_BASE_TS = datetime(2024, 1, 1)

_event = st.tuples(
    st.integers(min_value=1, max_value=50),      # lsn (collisions = dup delivery)
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(min_value=0, max_value=3),       # conv
    st.integers(min_value=0, max_value=2),       # turn
    st.integers(min_value=0, max_value=5),       # ts offset seconds (ties likely)
)


@st.composite
def _changelog(draw):
    events = draw(st.lists(_event, min_size=1, max_size=25))
    # dedup exact (lsn) collisions into verbatim re-deliveries: same lsn must
    # mean same event (at-least-once), so make payload a function of lsn.
    rows = []
    for lsn, op, conv, turn, dt_s in events:
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": f"conv-{conv}",
                "turn_idx": turn,
                "role": None if op == "delete" else "user",
                "text": None if op == "delete" else f"text-{lsn}",
                "tool": None,
                "ts": _BASE_TS + timedelta(seconds=dt_s),
            }
        )
    # enforce at-least-once consistency: rows sharing an lsn are identical
    by_lsn = {}
    for r in rows:
        by_lsn.setdefault(r["lsn"], r)
    rows = [dict(by_lsn[r["lsn"]]) for r in rows]
    split = draw(st.integers(min_value=0, max_value=len(rows)))
    return rows, split


def _run_case(spark, tmpdir: str, rows, split, mode: str) -> pd.DataFrame:
    tbl = create_transcripts_table(spark, tmpdir + "/t", n_buckets=2, mode=mode)
    cols = (
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts timestamp_ntz"
    )

    def to_df(rs):
        return spark.createDataFrame([tuple(r.values()) for r in rs], cols)

    epochs = [rows[:split], rows[split:]]
    for i, ep in enumerate(epochs):
        if ep:
            apply_changes(
                tbl, to_df(ep), i,
                auto_compact_files=1 if mode == "mor" else None,
            )
    return (
        tbl.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "role", "text", "tool"]]
        .reset_index(drop=True)
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_changelog())
def test_engine_matches_oracle_on_random_logs(spark, tmp_path_factory, case):
    rows, split = case
    tmpdir = str(tmp_path_factory.mktemp("prop"))
    got = _run_case(spark, tmpdir, rows, split, mode="cow")
    want_full = reduce_changelog(pd.DataFrame(rows))
    want = want_full[["conv_id", "turn_idx", "role", "text", "tool"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_changelog())
def test_mor_matches_oracle_on_random_logs(spark, tmp_path_factory, case):
    """Merge-on-read (delta appends + read-time LWW + aggressive
    auto-compaction every epoch) must agree with the same oracle on the same
    adversarial logs — dup deliveries, ts ties, deletes across the epoch
    split included."""
    rows, split = case
    tmpdir = str(tmp_path_factory.mktemp("propm"))
    got = _run_case(spark, tmpdir, rows, split, mode="mor")
    want_full = reduce_changelog(pd.DataFrame(rows))
    want = want_full[["conv_id", "turn_idx", "role", "text", "tool"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_changelog(), st.sets(st.sampled_from(["role", "text", "tool", "ts", "lsn"])))
def test_projected_read_matches_full_on_random_logs(
    spark, tmp_path_factory, case, cols
):
    """read(columns=C) must equal read().select(key ∪ C) for ANY column
    subset on ANY adversarial log under merge-on-read — winner selection
    with unscanned payload columns stays exact (dup deliveries, ts ties,
    deletes included)."""
    rows, split = case
    tmpdir = str(tmp_path_factory.mktemp("projprop"))
    tbl = create_transcripts_table(spark, tmpdir + "/t", n_buckets=2, mode="mor")
    colddl = (
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts timestamp_ntz"
    )
    epochs = [rows[:split], rows[split:]]
    for i, ep in enumerate(epochs):
        if ep:
            apply_changes(
                tbl,
                spark.createDataFrame([tuple(r.values()) for r in ep], colddl),
                i,
            )
    proj = tbl.read(columns=sorted(cols))
    # output-schema contract: key ∪ requested, in table-schema order
    want_cols = [
        f.name
        for f in tbl.schema.fields
        if f.name in ({"conv_id", "turn_idx"} | cols)
    ]
    assert proj.columns == want_cols
    expect = tbl.read().select(*want_cols)
    got = sorted(map(tuple, proj.collect()))
    want = sorted(map(tuple, expect.collect()))
    assert got == want

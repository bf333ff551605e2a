"""Property-based check: colocated_join == plain join on arbitrary logs.

Hypothesis generates small adversarial change logs (duplicate deliveries,
ts ties, deletes, an arbitrary epoch split) plus a random join type and a
random ``max_branches`` grouping; the exchange-free bucket-aligned join
must agree row-for-row with Spark's own shuffle join of the same two
tables on every one. This is the operator's whole contract in one
property — per-bucket LWW collapse, tombstone filtering, one-sided-bucket
null-extension, and aligned branch grouping all have to be right at once.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.operators.colocated import colocated_join
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_BASE_TS = datetime(2024, 1, 1)

_event = st.tuples(
    st.integers(min_value=1, max_value=40),      # lsn
    st.sampled_from(["insert", "update", "delete"]),
    st.integers(min_value=0, max_value=5),       # conv
    st.integers(min_value=0, max_value=2),       # turn
    st.integers(min_value=0, max_value=4),       # ts offset (ties likely)
)

_DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)


@st.composite
def _case(draw):
    events = draw(st.lists(_event, min_size=1, max_size=20))
    by_lsn = {}
    for lsn, op, conv, turn, dt_s in events:
        by_lsn.setdefault(lsn, (lsn, op, conv, turn, dt_s))
    rows = [by_lsn[e[0]] for e in events]
    # dim covers a random subset of conversations -> one-sided buckets
    dim_convs = draw(st.sets(st.integers(0, 5), max_size=6))
    how = draw(st.sampled_from(["inner", "left", "right", "full"]))
    max_branches = draw(st.sampled_from([None, 1, 2]))
    return rows, sorted(dim_convs), how, max_branches


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_case())
def test_colocated_equals_plain_join_on_random_logs(
    spark, tmp_path_factory, case
):
    rows, dim_convs, how, max_branches = case
    d = str(tmp_path_factory.mktemp("spjprop"))
    fact = create_transcripts_table(spark, d + "/f", n_buckets=3, mode="mor")
    cols = (
        "lsn long, op string, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts timestamp_ntz"
    )
    batch = spark.createDataFrame(
        [
            (
                lsn,
                op,
                f"conv-{conv}",
                turn,
                None if op == "delete" else "user",
                None if op == "delete" else f"text-{lsn}",
                None,
                _BASE_TS + timedelta(seconds=dt_s),
            )
            for lsn, op, conv, turn, dt_s in rows
        ],
        cols,
    )
    apply_changes(fact, batch, 0)
    dim = SnapshotTable.create(
        spark, d + "/d", _DIM_SCHEMA, n_buckets=3,
        key=("conv_id",), order=("max_lsn",), mode="mor",
    )
    dim_df = spark.createDataFrame(
        [(f"conv-{c}", float(c), c) for c in dim_convs], _DIM_SCHEMA
    )
    dim.bootstrap(dim_df, epoch_id=0)

    out = colocated_join(
        fact,
        dim,
        on=["conv_id"],
        select_left=["turn_idx", "text"],
        select_right=["score"],
        how=how,
        max_branches=max_branches,
    )
    plain = (
        fact.read()
        .select("conv_id", "turn_idx", "text")
        .join(dim.read().select("conv_id", "score"), on="conv_id", how=how)
        .select(*out.columns)
    )
    got = sorted(map(tuple, out.collect()), key=str)
    want = sorted(map(tuple, plain.collect()), key=str)
    assert got == want

"""Storage-partitioned (co-located) join: two same-bucketed tables join
bucket-by-bucket with ZERO Exchange.

The scale claim under test: a plain ``read().join(read())`` between the
facts table and a same-keyed derived table shuffles BOTH tables; the
co-located join must produce identical rows with no shuffle at all (the
bucket layout already co-partitions every join key). Plan shape is
regression-pinned like the MoR read's (tests/test_mor.py): the executed
plan must contain one SortMergeJoin per co-present bucket and no Exchange
node of any kind.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.operators.colocated import colocated_join
from mas_scada_bulkingest_spark.pipeline import apply_changes

FACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("lsn", T.LongType()),
    ]
)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)


def _fact_table(spark, path, n_convs=9, mode="mor", n_buckets=4):
    tbl = SnapshotTable.create(
        spark, path, FACT_SCHEMA, n_buckets=n_buckets,
        key=("conv_id", "turn_idx"), order=("ts", "lsn"), mode=mode,
    )
    rows = [(f"c{i % n_convs}", i % 5, f"t{i}", None, i) for i in range(240)]
    batch = (
        spark.createDataFrame(rows, FACT_SCHEMA)
        .withColumn(
            "ts",
            F.lit("2024-01-01").cast("timestamp_ntz")
            + F.make_dt_interval(secs=F.col("lsn")),
        )
        .withColumn("op", F.lit("update"))
    )
    # two epochs so MoR reads resolve LWW across delta files inside the join
    apply_changes(tbl, batch.filter(F.col("lsn") % 2 == 0), epoch_id=0)
    apply_changes(tbl, batch.filter(F.col("lsn") % 2 == 1), epoch_id=1)
    # a delete: the joined output must not resurrect it
    d = (
        batch.filter(F.col("lsn") == 7)
        .withColumn("op", F.lit("delete"))
        .withColumn("lsn", F.lit(10_000).cast("long"))
        .withColumn(
            "ts",
            F.lit("2024-01-02").cast("timestamp_ntz"),
        )
    )
    apply_changes(tbl, d, epoch_id=2)
    return tbl


def _dim_table(spark, path, fact, drop_conv="c3", n_buckets=4):
    tbl = SnapshotTable.create(
        spark, path, DIM_SCHEMA, n_buckets=n_buckets,
        key=("conv_id",), order=("max_lsn",), mode="mor",
    )
    dim = (
        fact.read()
        .filter(F.col("conv_id") != drop_conv)  # make some buckets one-sided
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("double").alias("score"),
            F.max("lsn").alias("max_lsn"),
        )
    )
    tbl.bootstrap(dim, epoch_id=0)
    return tbl


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()), key=str)


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_matches_plain_join(spark, tmpdir_path, how):
    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    out = colocated_join(fact, dim, on=["conv_id"], how=how)
    cols = out.columns
    plain = fact.read().join(dim.read(), on="conv_id", how=how)
    assert _rows(out, cols) == _rows(plain, cols)


def test_right_join_and_projection(spark, tmpdir_path):
    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    out = colocated_join(
        fact, dim, on=["conv_id"], how="right",
        select_left=["turn_idx", "text"], select_right=["score"],
    )
    assert out.columns == ["conv_id", "turn_idx", "text", "score"]
    plain = (
        fact.read().select("conv_id", "turn_idx", "text")
        .join(dim.read().select("conv_id", "score"), on="conv_id", how="right")
    )
    assert _rows(out, out.columns) == _rows(plain, out.columns)


def test_plan_is_exchange_free(spark, tmpdir_path):
    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact, drop_conv="nope")
    spark.conf.set("spark.mas_scada.mor.read.freeze_interpreted", "false")
    try:
        out = colocated_join(fact, dim, on=["conv_id"], how="inner")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.mas_scada.mor.read.freeze_interpreted")
    assert "Exchange" not in plan, plan
    # one SMJ per co-present bucket, never a single global join (AQE's
    # toString repeats the plan under "== Initial Plan ==" — count the
    # final section only)
    final_plan = plan.split("== Initial Plan ==")[0]
    n_buckets = len(
        set(dict(fact._bucket_file_groups())) & set(dict(dim._bucket_file_groups()))
    )
    assert final_plan.count("SortMergeJoin") == n_buckets
    # the plain join DOES shuffle — the thing the operator removes
    plain = fact.read().join(dim.read(), on="conv_id")
    plain.collect()
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()


def test_cow_side_supported(spark, tmpdir_path):
    fact = _fact_table(spark, tmpdir_path + "/f", mode="cow")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    out = colocated_join(fact, dim, on=["conv_id"])
    plain = fact.read().join(dim.read(), on="conv_id")
    assert _rows(out, out.columns) == _rows(plain, out.columns)


def test_validation_errors(spark, tmpdir_path):
    fact = _fact_table(spark, tmpdir_path + "/f")
    with pytest.raises(ValueError, match="bucket counts differ"):
        colocated_join(
            fact,
            _dim_table(spark, tmpdir_path + "/d8", fact, n_buckets=8),
            on=["conv_id"],
        )
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    with pytest.raises(ValueError, match="must include the bucket column"):
        colocated_join(fact, dim, on=["turn_idx"])
    with pytest.raises(ValueError, match="lacks columns"):
        colocated_join(fact, dim, select_right=["nope"])
    with pytest.raises(ValueError, match="how="):
        colocated_join(fact, dim, how="cross")
    # overlapping payload column: build a dim carrying "text" too
    clash_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("max_lsn", T.LongType()),
        ]
    )
    clash = SnapshotTable.create(
        spark, tmpdir_path + "/clash", clash_schema, n_buckets=4,
        key=("conv_id",), order=("max_lsn",), mode="mor",
    )
    clash.bootstrap(
        fact.read().groupBy("conv_id").agg(
            F.max("text").alias("text"), F.max("lsn").alias("max_lsn")
        ),
        epoch_id=0,
    )
    with pytest.raises(ValueError, match="non-key columns"):
        colocated_join(fact, clash)


def test_empty_intersection_returns_empty(spark, tmpdir_path):
    fact = _fact_table(spark, tmpdir_path + "/f")
    empty = SnapshotTable.create(
        spark, tmpdir_path + "/e", DIM_SCHEMA, n_buckets=4,
        key=("conv_id",), order=("max_lsn",), mode="mor",
    )
    out = colocated_join(fact, empty, on=["conv_id"], how="inner")
    assert out.count() == 0
    # left join against the empty table keeps every fact row, null-extended
    left = colocated_join(fact, empty, on=["conv_id"], how="left")
    assert left.count() == fact.read().count()
    assert left.filter(F.col("score").isNotNull()).count() == 0


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_max_branches_grouping_exact(spark, tmpdir_path, how):
    """Aligned bucket-grouping (plan-size bound at large bucket counts):
    grouped branches must produce identical rows — cross-bucket rows can
    never equijoin since the join key determines the bucket — with at
    most max_branches SortMergeJoins and still zero Exchange."""
    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    full = colocated_join(fact, dim, on=["conv_id"], how=how)
    spark.conf.set("spark.mas_scada.mor.read.freeze_interpreted", "false")
    try:
        grouped = colocated_join(
            fact, dim, on=["conv_id"], how=how, max_branches=2
        )
        grouped.collect()
        plan = grouped._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.mas_scada.mor.read.freeze_interpreted")
    assert _rows(grouped, grouped.columns) == _rows(full, grouped.columns)
    assert "Exchange" not in plan
    final_plan = plan.split("== Initial Plan ==")[0]
    assert 1 <= final_plan.count("SortMergeJoin") <= 2


IDX_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("last_text", T.StringType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)


def _idx_table(spark, path, fact, drop_conv="c5"):
    from mas_scada_bulkingest_spark.operators.colocated import (  # noqa: F401
        colocated_join_many,
    )

    tbl = SnapshotTable.create(
        spark, path, IDX_SCHEMA, n_buckets=4,
        key=("conv_id",), order=("max_lsn",), mode="mor",
    )
    tbl.bootstrap(
        fact.read()
        .filter(F.col("conv_id") != drop_conv)
        .groupBy("conv_id")
        .agg(
            F.max_by("text", F.col("lsn")).alias("last_text"),
            F.max("lsn").alias("max_lsn"),
        ),
        epoch_id=0,
    )
    return tbl


@pytest.mark.parametrize("how", ["inner", "left"])
def test_multiway_star_matches_plain_chain(spark, tmpdir_path, how):
    """Facts x rollup x latest-turn index in ONE exchange-free pass: the
    chained per-bucket SortMergeJoins must equal Spark's own two shuffle
    joins, including buckets where one right side is absent."""
    from mas_scada_bulkingest_spark.operators.colocated import (
        colocated_join_many,
    )

    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)        # drops c3
    idx = _idx_table(spark, tmpdir_path + "/i", fact)        # drops c5
    out = colocated_join_many(
        fact,
        [dim, idx],
        on=["conv_id"],
        how=how,
        select_left=["turn_idx", "text"],
        select_rights=[["score"], ["last_text"]],
    )
    assert out.columns == ["conv_id", "turn_idx", "text", "score", "last_text"]
    plain = (
        fact.read()
        .select("conv_id", "turn_idx", "text")
        .join(dim.read().select("conv_id", "score"), on="conv_id", how=how)
        .join(idx.read().select("conv_id", "last_text"), on="conv_id", how=how)
    )
    assert _rows(out, out.columns) == _rows(plain, out.columns)


def test_multiway_plan_exchange_free_and_grouped(spark, tmpdir_path):
    from mas_scada_bulkingest_spark.operators.colocated import (
        colocated_join_many,
    )

    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact, drop_conv="nope")
    idx = _idx_table(spark, tmpdir_path + "/i", fact, drop_conv="nope")
    spark.conf.set("spark.mas_scada.mor.read.freeze_interpreted", "false")
    try:
        out = colocated_join_many(
            fact, [dim, idx], on=["conv_id"], max_branches=2,
            select_rights=[["score"], ["last_text"]],
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.mas_scada.mor.read.freeze_interpreted")
    assert "Exchange" not in plan
    final_plan = plan.split("== Initial Plan ==")[0]
    # two joins per slot, at most 2 slots
    assert 2 <= final_plan.count("SortMergeJoin") <= 4


def test_multiway_validations(spark, tmpdir_path):
    from mas_scada_bulkingest_spark.operators.colocated import (
        colocated_join_many,
    )

    fact = _fact_table(spark, tmpdir_path + "/f")
    dim = _dim_table(spark, tmpdir_path + "/d", fact)
    with pytest.raises(ValueError, match="empty rights"):
        colocated_join_many(fact, [])
    with pytest.raises(ValueError, match="not supported for a multi-way"):
        colocated_join_many(fact, [dim], how="full")
    with pytest.raises(ValueError, match="one entry"):
        colocated_join_many(fact, [dim], select_rights=[["score"], ["x"]])
    # duplicate output column across two rights
    dim2 = _dim_table(spark, tmpdir_path + "/d2", fact)
    with pytest.raises(ValueError, match="appears on both"):
        colocated_join_many(fact, [dim, dim2])


def test_pack_aligned_resolves_manifest_bytes(spark, tmpdir_path):
    """Regression (r5): _pack_aligned must resolve group files (absolute
    paths) against the snapshot's RELATIVE-keyed file_sizes manifest. A
    bare dict lookup silently fell back to a constant default for every
    file, degrading the byte-weighted LPT to file-count packing — the fat
    bucket got chained behind unrelated buckets, re-creating the straggler
    the grouping exists to bound (measured 1.13x at 2M rows,
    tools/bench_colocated_straggler.py)."""
    from mas_scada_bulkingest_spark.operators.colocated import _pack_aligned

    fact = _fact_table(spark, tmpdir_path + "/f", n_buckets=4)
    # fatten ONE conversation so its bucket dominates by bytes, not files —
    # payload must be INCOMPRESSIBLE or the parquet codec flattens the skew
    import hashlib

    def _blob(i):
        return "".join(
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest() for j in range(300)
        )

    fat = spark.createDataFrame(
        [(f"c0", i % 5, _blob(i), None, 50_000 + i) for i in range(40)],
        FACT_SCHEMA,
    ).withColumn(
        "ts",
        F.lit("2024-01-03").cast("timestamp_ntz"),
    ).withColumn("op", F.lit("update"))
    apply_changes(fact, fat, epoch_id=3)
    dim = _dim_table(spark, tmpdir_path + "/d", fact, drop_conv="nope")

    lg = dict(fact._bucket_file_groups())
    rg = dict(dim._bucket_file_groups())
    ids = sorted(set(lg) | set(rg))
    sizes = fact._snapshot["file_sizes"]
    import os as _os

    def _bucket_bytes(b):
        return sum(
            sizes.get(_os.path.relpath(f, fact.path), 0)
            for f in lg.get(b, [])
        )

    fat_bucket = max(ids, key=_bucket_bytes)
    # every bucket has the same FILE COUNT shape (epochs touch all), so
    # only true byte weighting isolates the fat one
    slots = _pack_aligned(ids, [lg, rg], [fact, dim], 2)
    fat_slot = next(s for s in slots if fat_bucket in s)
    other = [s for s in slots if fat_bucket not in s]
    assert other, slots
    # LPT: the fat bucket's slot must carry FEWER buckets than the rest
    # (ideally alone) — count-packing would split 4 buckets 2/2
    assert len(fat_slot) < max(len(s) for s in other), slots

"""Exchange-free join of two co-bucketed lake tables — the engine's
storage-partitioned join (SPJ).

Two :class:`~..lake.snapshot_table.SnapshotTable`\\ s that bucket on the
same leading key with the same bucket count are **co-located**: every join
key value lives in bucket ``xxhash64(key) % N`` on BOTH tables, so the join
is decidable bucket-by-bucket with no data movement. A plain
``left.read().join(right.read())`` discards that layout — Catalyst plans a
full Exchange of BOTH tables before the join, and at 100 TB joining the
facts table with a same-keyed derived table (rollup, serving index,
registry) pays two table-sized shuffles for rows that are already
physically aligned. Broadcast solves only the small-side case; this module
solves the LARGE × LARGE case, the same gap Iceberg's storage-partitioned
joins (Spark 3.3+, ``spark.sql.sources.v2.bucketing.enabled``) and Hive's
bucket map-join close — re-expressed over this engine's bucket layout.

Shape (per aligned bucket ``b``)::

    Scan(left b files)  -> Coalesce(1) -> HashAggregate (LWW)  \\
                                                               SortMergeJoin
    Scan(right b files) -> Coalesce(1) -> HashAggregate (LWW)  /

Both children are SinglePartition, which satisfies the join's
ClusteredDistribution requirement on each side AND the co-partitioning
check between them, so EnsureRequirements inserts **no Exchange**: each
bucket's join runs inside its own task, sorts are partition-local, and the
whole result is a UNION of per-bucket branches (one task per bucket —
exactly the parallelism/skew story of the MoR read itself, including its
empty-pad guard against UnionExec's all-SinglePartition single-task
collapse). The ``merge`` hint pins sort-merge join: per-branch broadcast
would re-materialize each bucket once per executor for zero benefit, and
sort-merge spills gracefully when a bucket outgrows memory.

A bucket present on only one side never fabricates an empty-scan child
(an empty RDD reports UnknownPartitioning, which would make
EnsureRequirements shuffle BOTH sides of that branch): inner joins skip the
bucket, outer joins null-extend the present side directly — algebraically
identical to joining against an empty relation, with no join node at all.

Correctness: each side's branch is the table's own bucket-local LWW
collapse (tombstones resolved then filtered), so the join sees exactly
``read()``'s rows — driver-oracle-checked end-to-end by the
``cdc_colocated_join`` entry against DuckDB computing both sides from the
raw changelog. The reference has no table-table join (its enrichment is
the in-process entity cache, SURVEY.md §2 J3); the public analog is
Iceberg SPJ.

At 10^10 events: parallelism = n_buckets (size it ≥ cluster parallelism,
same rule as the read path); per-task memory is one bucket of EACH side
(bounded by ``rebucket()`` as tables grow); stragglers follow the read
path's byte-weighted story. Co-location is free to maintain — derived
tables (``derived.refresh_derived``) already inherit the source's key and
can be created with the source's bucket count.
"""

from __future__ import annotations

from functools import reduce
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # runtime import is deferred: lake imports operators.lww
    from ..lake.snapshot_table import SnapshotTable

__all__ = ["colocated_join"]

_HOW = {
    "inner": "inner",
    "left": "left",
    "leftouter": "left",
    "left_outer": "left",
    "right": "right",
    "rightouter": "right",
    "right_outer": "right",
    "full": "full",
    "outer": "full",
    "fullouter": "full",
    "full_outer": "full",
}


def colocated_join(
    left: SnapshotTable,
    right: SnapshotTable,
    on: list[str] | None = None,
    how: str = "inner",
    select_left: list[str] | None = None,
    select_right: list[str] | None = None,
    max_branches: int | None = None,
) -> DataFrame:
    """Join two co-bucketed tables with zero Exchange (module docstring).

    ``on`` defaults to the shared leading bucket key and must include it —
    a join that drops the bucket column is not co-located and belongs in a
    plain ``read().join()``. ``select_left`` / ``select_right`` narrow each
    side's payload columns (join keys are implied); narrowing also prunes
    the parquet scan schema, same as ``read(columns=...)``. Non-key columns
    present on both sides must be projected away on one side — silent
    suffixing would hide a schema drift between a source and its derived
    table.

    ``max_branches`` bounds plan size at very large bucket counts (the
    join-side twin of ``read``'s branch grouping, same LPT byte-weighting
    rule — weight = the bucket's bytes on BOTH sides): several buckets
    share one SortMergeJoin branch. Grouping MUST be by bucket id and
    identical on both sides, and then every join type stays exact with no
    per-bucket special-casing: a key's rows live in ONE bucket on each
    table, so rows from different buckets inside a shared branch can
    never equijoin (the join keys include the bucket column), and each
    side's multi-bucket LWW collapse is exact for the same reason the
    read path's grouped branches are.
    """
    from ..lake.snapshot_table import _TOMBSTONE  # deferred (cycle)

    how_n = _HOW.get(str(how).lower().replace(" ", ""))
    if how_n is None:
        raise ValueError(
            f"how={how!r} not supported; use inner/left/right/full"
        )
    lb_key, rb_key = list(left.key)[0], list(right.key)[0]
    if lb_key != rb_key:
        raise ValueError(
            f"not co-located: leading bucket keys differ "
            f"({lb_key!r} vs {rb_key!r}) — a co-located join requires both "
            "tables bucketed on the same-named leading key"
        )
    if left.n_buckets != right.n_buckets:
        raise ValueError(
            f"not co-located: bucket counts differ ({left.n_buckets} vs "
            f"{right.n_buckets}) — rebucket() one table to match "
            "(bucket functions only align at equal N)"
        )
    on = list(on) if on is not None else [lb_key]
    if lb_key not in on:
        raise ValueError(
            f"join keys {on} must include the bucket column {lb_key!r}; "
            "joins on other columns are not bucket-decidable — use "
            "read().join()"
        )

    def _side_cols(tbl: SnapshotTable, sel, label: str) -> list[str]:
        names = [f.name for f in tbl.schema.fields]
        missing = [c for c in (sel or []) + on if c not in names]
        if missing:
            raise ValueError(f"{label} table lacks columns {missing}")
        if sel is None:
            return [c for c in names if c not in on]
        return [c for c in sel if c not in on]

    lcols = _side_cols(left, select_left, "left")
    rcols = _side_cols(right, select_right, "right")
    clash = sorted(set(lcols) & set(rcols))
    if clash:
        raise ValueError(
            f"both sides carry non-key columns {clash}; project one side "
            "away via select_left/select_right (no silent suffixing)"
        )
    out_cols = [*on, *lcols, *rcols]

    def _branch(tbl: SnapshotTable, group, keep: list[str]) -> DataFrame:
        # manifest-level pruning: the collapse needs key+order, the caller
        # needs on+keep; nothing else reaches the parquet reader
        project = set(on) | set(keep) | set(tbl.key) | set(tbl.order)
        df = tbl._collapsed_branch(group, tbl._storage_schema(project))
        return df.filter(~F.col(_TOMBSTONE)).select(*on, *keep)

    def _null_extend(df: DataFrame, other: SnapshotTable, keep: list[str]):
        # outer-join a bucket that exists on one side only: extending with
        # typed NULLs IS the join-against-empty result, and synthesizing an
        # empty scan child would report UnknownPartitioning and shuffle the
        # branch (module docstring)
        types = {f.name: f.dataType for f in other.schema.fields}
        return df.select(
            "*", *[F.lit(None).cast(types[c]).alias(c) for c in keep]
        )

    lgroups = dict(left._bucket_file_groups())
    rgroups = dict(right._bucket_file_groups())
    bucket_ids = sorted(set(lgroups) | set(rgroups))
    if max_branches is not None and len(bucket_ids) > max(int(max_branches), 1):
        slots = _pack_aligned(
            bucket_ids, lgroups, rgroups, left, right, max(int(max_branches), 1)
        )
    else:
        slots = [[b] for b in bucket_ids]
    branches: list[DataFrame] = []
    for slot in slots:
        lg = [f for b in slot for f in lgroups.get(b, [])]
        rg = [f for b in slot for f in rgroups.get(b, [])]
        if lg and rg:
            lb = _branch(left, (slot[0], lg), lcols)
            rb = _branch(right, (slot[0], rg), rcols)
            j = lb.join(rb.hint("merge"), on=on, how=how_n)
        elif lg and how_n in ("left", "full"):
            j = _null_extend(_branch(left, (slot[0], lg), lcols), right, rcols)
        elif rg and how_n in ("right", "full"):
            j = _null_extend(_branch(right, (slot[0], rg), rcols), left, lcols)
        else:
            continue  # buckets absent on the side the join preserves
        branches.append(j.select(*out_cols))
    if not branches:
        schema = left.spark.createDataFrame(
            [], _join_schema(left, right, on, lcols, rcols)
        )
        return schema
    # same empty >1-partition pad as _read_collapsed_local: defeats
    # UnionExec's all-SinglePartition single-task collapse
    pad = left.spark.createDataFrame(
        left.spark.sparkContext.parallelize([], 2), schema=branches[0].schema
    )
    out = reduce(DataFrame.union, branches).union(pad)
    # same gated plan-freeze as the read path (one Janino class per branch
    # otherwise — a join doubles the branch count); honors
    # spark.mas_scada.mor.read.freeze_interpreted
    return left._freeze_interpreted(out)


def _pack_aligned(
    bucket_ids, lgroups, rgroups, left, right, nb: int
) -> list[list[int]]:
    """Greedy LPT over per-bucket COMBINED bytes (both sides' manifests),
    packing bucket ids into ``nb`` slots — the straggler control the read
    path uses (``_pack_groups_by_bytes``), adapted to weight a bucket by
    the work the join branch actually does: scanning and collapsing BOTH
    tables' files for it. Packing by id keeps the two sides' grouping
    identical, which is what makes grouped branches exact."""
    import heapq

    lsizes = left._snapshot.get("file_sizes", {})
    rsizes = right._snapshot.get("file_sizes", {})

    def _w(b: int) -> int:
        return sum(lsizes.get(f, 1 << 20) for f in lgroups.get(b, [])) + sum(
            rsizes.get(f, 1 << 20) for f in rgroups.get(b, [])
        )

    heap = [(0, i) for i in range(nb)]
    heapq.heapify(heap)
    slots: list[list[int]] = [[] for _ in range(nb)]
    for w, b in sorted(((_w(b), b) for b in bucket_ids), reverse=True):
        load, i = heapq.heappop(heap)
        slots[i].append(b)
        heapq.heappush(heap, (load + w, i))
    return [sorted(s) for s in slots if s]


def _join_schema(left, right, on, lcols, rcols):
    from pyspark.sql import types as T

    by_name = {f.name: f for f in [*left.schema.fields, *right.schema.fields]}
    lefts = {f.name: f for f in left.schema.fields}
    fields = [lefts.get(c, by_name[c]) for c in on]
    fields += [lefts[c] for c in lcols]
    fields += [
        {f.name: f for f in right.schema.fields}[c] for c in rcols
    ]
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in fields]
    )

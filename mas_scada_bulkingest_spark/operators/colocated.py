"""Exchange-free join of two (or more) co-bucketed lake tables — the
engine's storage-partitioned join (SPJ).

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

:func:`colocated_join_many` generalizes to a STAR of co-bucketed tables
(facts ⋈ rollup ⋈ serving-index ⋈ …): a chain of SortMergeJoins inside
each bucket's task — every intermediate stays SinglePartition, so the
whole multi-way enrichment is one exchange-free pass where a plain
formulation would shuffle every table.

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
path's byte-weighted story — ``max_branches`` applies the same LPT
grouping to the join. Co-location is free to maintain — derived tables
(``derived.refresh_derived``) already inherit the source's key and can be
created with the source's bucket count.
"""

from __future__ import annotations

from functools import reduce
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # runtime import is deferred: lake imports operators.lww
    from ..lake.snapshot_table import SnapshotTable

__all__ = ["colocated_join", "colocated_join_many"]

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


# --------------------------------------------------------------- internals
def _check_colocated(left, right, on: list[str]) -> None:
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
    if lb_key not in on:
        raise ValueError(
            f"join keys {on} must include the bucket column {lb_key!r}; "
            "joins on other columns are not bucket-decidable — use "
            "read().join()"
        )


def _side_cols(tbl, sel, on: list[str], label: str) -> list[str]:
    names = [f.name for f in tbl.schema.fields]
    missing = [c for c in (sel or []) + on if c not in names]
    if missing:
        raise ValueError(f"{label} table lacks columns {missing}")
    if sel is None:
        return [c for c in names if c not in on]
    return [c for c in sel if c not in on]


def _branch(tbl, group, on: list[str], keep: list[str]) -> DataFrame:
    # manifest-level pruning: the collapse needs key+order, the caller
    # needs on+keep; nothing else reaches the parquet reader
    from ..lake.snapshot_table import _TOMBSTONE

    project = set(on) | set(keep) | set(tbl.key) | set(tbl.order)
    df = tbl._collapsed_branch(group, tbl._storage_schema(project))
    return df.filter(~F.col(_TOMBSTONE)).select(*on, *keep)


def _null_extend(df: DataFrame, other, keep: list[str]) -> DataFrame:
    # join a bucket that exists on one side only: extending with typed
    # NULLs IS the join-against-empty result, and synthesizing an empty
    # scan child would report UnknownPartitioning and shuffle the branch
    # (module docstring)
    types = {f.name: f.dataType for f in other.schema.fields}
    return df.select(
        "*", *[F.lit(None).cast(types[c]).alias(c) for c in keep]
    )


def _pack_aligned(bucket_ids, group_maps, tables, nb: int) -> list[list[int]]:
    """Greedy LPT over per-bucket COMBINED bytes (every side's manifest),
    packing bucket ids into ``nb`` slots — the straggler control the read
    path uses (``_pack_groups_by_bytes``), adapted to weight a bucket by
    the work the join branch actually does: scanning and collapsing EVERY
    side's files for it. Packing by id keeps all sides' grouping
    identical, which is what makes grouped branches exact.

    Sizes resolve through the same helper as the read path's packer
    (``manifest_file_bytes``: relpath against the table root + stat
    fallback — a bare ``sizes.get(abs_path, default)`` silently degrades
    LPT to file-COUNT packing, re-creating the straggler this exists to
    bound)."""
    import heapq

    from ..lake.snapshot_table import manifest_file_bytes

    sizes = [t._snapshot.get("file_sizes", {}) for t in tables]
    roots = [t.path for t in tables]

    def _w(b: int) -> int:
        return sum(
            manifest_file_bytes(sz, root, gm.get(b, []))
            for gm, sz, root in zip(group_maps, sizes, roots)
        )

    heap = [(0, i) for i in range(nb)]
    heapq.heapify(heap)
    slots: list[list[int]] = [[] for _ in range(nb)]
    for w, b in sorted(((_w(b), b) for b in bucket_ids), reverse=True):
        load, i = heapq.heappop(heap)
        slots[i].append(b)
        heapq.heappush(heap, (load + w, i))
    return [sorted(s) for s in slots if s]


def _finish(left, branches: list[DataFrame], empty_schema) -> DataFrame:
    if not branches:
        return left.spark.createDataFrame([], empty_schema)
    # same empty >1-partition pad as _read_collapsed_local: defeats
    # UnionExec's all-SinglePartition single-task collapse
    pad = left.spark.createDataFrame(
        left.spark.sparkContext.parallelize([], 2), schema=branches[0].schema
    )
    out = reduce(DataFrame.union, branches).union(pad)
    # same gated plan-freeze as the read path (one Janino class per branch
    # otherwise — a join multiplies the branch count); honors
    # spark.mas_scada.mor.read.freeze_interpreted
    return left._freeze_interpreted(out)


def _join_schema(tables, on, col_lists):
    from pyspark.sql import types as T

    first = {f.name: f for f in tables[0].schema.fields}
    by_name = {
        f.name: f for t in reversed(tables) for f in t.schema.fields
    }
    fields = [first.get(c, by_name[c]) for c in on]
    for t, cols in zip(tables, col_lists):
        have = {f.name: f for f in t.schema.fields}
        fields += [have[c] for c in cols]
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in fields]
    )


# ----------------------------------------------------------------- public
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
    how_n = _HOW.get(str(how).lower().replace(" ", ""))
    if how_n is None:
        raise ValueError(
            f"how={how!r} not supported; use inner/left/right/full"
        )
    on = list(on) if on is not None else [list(left.key)[0]]
    _check_colocated(left, right, on)
    lcols = _side_cols(left, select_left, on, "left")
    rcols = _side_cols(right, select_right, on, "right")
    clash = sorted(set(lcols) & set(rcols))
    if clash:
        raise ValueError(
            f"both sides carry non-key columns {clash}; project one side "
            "away via select_left/select_right (no silent suffixing)"
        )
    out_cols = [*on, *lcols, *rcols]

    lgroups = dict(left._bucket_file_groups())
    rgroups = dict(right._bucket_file_groups())
    bucket_ids = sorted(set(lgroups) | set(rgroups))
    if max_branches is not None and len(bucket_ids) > max(int(max_branches), 1):
        slots = _pack_aligned(
            bucket_ids,
            [lgroups, rgroups],
            [left, right],
            max(int(max_branches), 1),
        )
    else:
        slots = [[b] for b in bucket_ids]
    branches: list[DataFrame] = []
    for slot in slots:
        lg = [f for b in slot for f in lgroups.get(b, [])]
        rg = [f for b in slot for f in rgroups.get(b, [])]
        if lg and rg:
            lb = _branch(left, (slot[0], lg), on, lcols)
            rb = _branch(right, (slot[0], rg), on, rcols)
            j = lb.join(rb.hint("merge"), on=on, how=how_n)
        elif lg and how_n in ("left", "full"):
            j = _null_extend(
                _branch(left, (slot[0], lg), on, lcols), right, rcols
            )
        elif rg and how_n in ("right", "full"):
            j = _null_extend(
                _branch(right, (slot[0], rg), on, rcols), left, lcols
            )
        else:
            continue  # buckets absent on the side the join preserves
        branches.append(j.select(*out_cols))
    return _finish(
        left, branches, _join_schema([left, right], on, [lcols, rcols])
    )


def colocated_join_many(
    left: SnapshotTable,
    rights: list[SnapshotTable],
    on: list[str] | None = None,
    how: str = "inner",
    select_left: list[str] | None = None,
    select_rights: list[list[str] | None] | None = None,
    max_branches: int | None = None,
) -> DataFrame:
    """STAR of co-located joins in one exchange-free pass: ``left`` joined
    with EVERY table in ``rights`` on the shared bucket key — the
    serving-pipeline assembly case (facts ⋈ rollup ⋈ latest-turn index ⋈
    dedup index, all conv_id-bucketed). Inside each bucket's task the
    joins chain as SortMergeJoins over SinglePartition intermediates, so
    the whole enrichment still plans ZERO Exchange where the plain
    formulation would shuffle every participant.

    ``how`` is applied to every join in the chain and is restricted to
    ``inner`` / ``left`` — the only types whose chained semantics are
    unambiguous (right/full across a star depend on association order;
    use :func:`colocated_join` pairwise if you genuinely need them). A
    bucket missing from some right side joins against nothing: the slot
    drops under ``inner``, null-extends under ``left`` — same rule as the
    two-table form, per side. Non-key output columns must be unique
    across ALL sides (no silent suffixing). ``max_branches`` groups
    buckets exactly as in :func:`colocated_join`, LPT-weighted by every
    side's bytes.
    """
    if not rights:
        raise ValueError("colocated_join_many: empty rights list")
    how_n = _HOW.get(str(how).lower().replace(" ", ""))
    if how_n not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} not supported for a multi-way co-located join; "
            "use inner or left (right/full are association-order-dependent "
            "across a star — join pairwise if you need them)"
        )
    on = list(on) if on is not None else [list(left.key)[0]]
    for r in rights:
        _check_colocated(left, r, on)
    sels = select_rights if select_rights is not None else [None] * len(rights)
    if len(sels) != len(rights):
        raise ValueError(
            "select_rights must have one entry (or None) per right table"
        )
    lcols = _side_cols(left, select_left, on, "left")
    rcols_list = [
        _side_cols(r, sel, on, f"rights[{i}]")
        for i, (r, sel) in enumerate(zip(rights, sels))
    ]
    seen: dict[str, str] = {c: "left" for c in lcols}
    for i, rc in enumerate(rcols_list):
        for c in rc:
            if c in seen:
                raise ValueError(
                    f"column {c!r} appears on both {seen[c]} and "
                    f"rights[{i}]; project one side away (no silent "
                    "suffixing)"
                )
            seen[c] = f"rights[{i}]"
    out_cols = [*on, *lcols, *[c for rc in rcols_list for c in rc]]

    lgroups = dict(left._bucket_file_groups())
    rgroup_list = [dict(r._bucket_file_groups()) for r in rights]
    # left-preserving joins only: buckets with no left rows emit nothing
    bucket_ids = sorted(lgroups)
    if max_branches is not None and len(bucket_ids) > max(int(max_branches), 1):
        slots = _pack_aligned(
            bucket_ids,
            [lgroups, *rgroup_list],
            [left, *rights],
            max(int(max_branches), 1),
        )
    else:
        slots = [[b] for b in bucket_ids]
    branches: list[DataFrame] = []
    for slot in slots:
        lg = [f for b in slot for f in lgroups.get(b, [])]
        if not lg:
            continue
        j = _branch(left, (slot[0], lg), on, lcols)
        dead = False
        first = True
        for r, rgroups, rcols in zip(rights, rgroup_list, rcols_list):
            rg = [f for b in slot for f in rgroups.get(b, [])]
            if rg:
                rb = _branch(r, (slot[0], rg), on, rcols)
                if not first:
                    # a join's output reports PartitioningCollection, which
                    # the NEXT join's co-partition check does not recognize
                    # as SinglePartition — re-assert it with a free
                    # coalesce(1) (the data already lives in one partition)
                    # or EnsureRequirements shuffles the chain
                    j = j.coalesce(1)
                j = j.join(rb.hint("merge"), on=on, how=how_n)
                first = False
            elif how_n == "left":
                j = _null_extend(j, r, rcols)
            else:  # inner against an absent side: the slot is empty
                dead = True
                break
        if dead:
            continue
        branches.append(j.select(*out_cols))
    return _finish(
        left,
        branches,
        _join_schema([left, *rights], on, [lcols, *rcols_list]),
    )

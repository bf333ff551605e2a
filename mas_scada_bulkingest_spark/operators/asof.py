"""As-of (temporal) join: each fact row picks the latest dimension row
whose timestamp is <= the fact's timestamp, per key.

The reference engine has no as-of join — its closest analog is the
stateful cache-lookup enrichment (TagData.java getSourceMap + the
dimension putSafe path), which always serves the *current* dimension
row regardless of the fact's event time. A CDC/transcript pipeline
needs the time-correct form: enrich each turn with the conversation's
status *as of that turn's event time*, so replays and backfills produce
the same enrichment a live run did.

Spark has no built-in as-of join. The classic scalable formulation —
used here — is the union-sort trick:

1. tag dimension rows ``_is_dim=1`` and fact rows ``_is_dim=0``;
2. ``unionByName`` them (fact payloads and dim payloads are disjoint
   column sets, missing sides read NULL);
3. one window per key ordered by ``(ts, _is_dim DESC)`` with a
   ``last(payload_struct, ignorenulls=True)`` running fill — the payload
   travels as ONE struct so the fill is whole-ROW (a matched dim row's
   NULL column stays NULL instead of resurrecting an older row's value);
   every fact row inherits the nearest preceding dim row (inclusive: a
   dim at exactly the fact's ts sorts before it);
4. filter the fact rows back out.

Cost model: ONE hash-partition + sort per side on the join key — the
same single shuffle a sort-merge join would pay, with no range-join
row explosion and no per-row Python. Skew is bounded by rows-per-key
(a conversation's length), not by value ranges. At 100 TB both inputs
shuffle once on ``on`` and stream through a per-partition sort —
exactly the plan a hand-built MERGE AS-OF would pick.

A broadcast-range alternative (broadcast dims, ``max_by`` over a range
predicate) wins only when dims are tiny AND facts are huge; the union
form is the safe default because it never materializes a fact×dim
intermediate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    on: Sequence[str],
    left_on: str = "ts",
    right_on: str = "ts",
    right_tiebreak: str | None = None,
    strategy: str = "union",
) -> DataFrame:
    """Left as-of join: every ``facts`` row, enriched with the payload of
    the latest ``dims`` row with ``dims[right_on] <= facts[left_on]`` for
    the same ``on`` key (NULL payload when no dim row precedes the fact).

    ``dims`` must contain exactly ``on + [right_on] + payload`` columns;
    payload column names must not collide with ``facts`` columns. When
    several dim rows share one ``(on, right_on)`` instant the winner is
    the max of ``right_tiebreak`` (required in that case — without a
    tiebreak, equal-instant dim rows make the fill nondeterministic).

    ``strategy`` picks the physical plan; both produce identical rows:

    ``"union"`` (default)
        the union-sort form (module doc): one hash+sort shuffle per
        side. The safe default — cost is never worse than a sort-merge
        join, regardless of either side's size.
    ``"broadcast"``
        dims collapse to ONE row per key holding its time-sorted
        (instant, payload) array; that map broadcasts, and each fact row
        resolves its as-of match with pure column expressions
        (``filter`` the array to instants <= the fact's, take the last).
        THE FACTS NEVER SHUFFLE — for a 100 TB fact table against a
        small dimension (statuses, price lists, config history) this is
        a map-only plan, the same reason broadcast-hash beats
        sort-merge. Requires per-key dim history to fit in one row
        (the broadcast threshold enforces the aggregate bound).
    """
    on = list(on)
    payload = [c for c in dims.columns if c not in on and c != right_on]
    collide = set(payload) & set(facts.columns)
    if collide:
        raise ValueError(f"dim payload columns collide with facts: {sorted(collide)}")

    if right_tiebreak is not None:
        # one deterministic dim row per (key, instant): max-tiebreak wins.
        # max_by over a struct of all payload cols = one partially
        # aggregatable pass, no window.
        others = [c for c in payload if c != right_tiebreak]
        dims = dims.groupBy(*on, right_on).agg(
            *[F.max_by(c, F.col(right_tiebreak)).alias(c) for c in others],
            F.max(right_tiebreak).alias(right_tiebreak),
        )

    if strategy == "broadcast":
        # one row per key: time-sorted (instant, payload…) structs. struct
        # comparison is lexicographic and instants are unique after the
        # tiebreak collapse, so sorting on the struct sorts on instant.
        hist = dims.groupBy(*on).agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(right_on).alias("_t"), *payload))
            ).alias("_hist")
        )
        joined = facts.join(F.broadcast(hist), on=on, how="left")
        # pure column exprs: prefix of history at-or-before the fact's
        # instant, last element wins. element_at(arr, -1) on an empty or
        # NULL array (unmatched key) yields NULL payload — the left-join
        # contract.
        prefix = F.filter(
            F.col("_hist"), lambda h: h["_t"] <= F.col(left_on)
        )
        # try_element_at: NULL (not an ANSI error) on empty prefix or an
        # unmatched key's NULL history
        match = F.try_element_at(prefix, F.lit(-1))
        return joined.select(
            *facts.columns, *[match[c].alias(c) for c in payload]
        )
    if strategy != "union":
        raise ValueError(f"unknown asof strategy {strategy!r}")

    # the payload rides as ONE struct so the fill is whole-row: a dim row
    # with a NULL payload COLUMN must still win (and deliver its NULL) —
    # per-column last(ignorenulls) would resurrect an older row's value
    # for just that column, tearing the matched row. The struct itself is
    # never NULL for a dim row, so last(_p, ignorenulls) picks exactly
    # the latest preceding dim ROW, matching the broadcast strategy and
    # ASOF JOIN row semantics.
    d = dims.select(
        *on,
        F.col(right_on).alias("_asof_ts"),
        F.lit(1).alias("_is_dim"),
        F.struct(*payload).alias("_p"),
    )
    f = facts.withColumn("_asof_ts", F.col(left_on)).withColumn(
        "_is_dim", F.lit(0)
    )
    merged = f.unionByName(d, allowMissingColumns=True)

    # dim rows sort BEFORE fact rows at the same instant (inclusive <=)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_p", F.last("_p", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_is_dim") == 0)
        .select(*facts.columns, *[F.col("_p")[c].alias(c) for c in payload])
    )

"""Cascading CDC: maintain PERSISTED derived tables off a source table's
changes feed, exactly-once and incrementally.

The reference pipeline stops at the fact table; real deployments hang
derived artifacts off it (per-conversation rollups, serving indexes,
registries) and keep them fresh without rescanning the source — the
Delta-CDF → downstream-MERGE pattern. This module implements that pattern
over this engine's own primitives, so the output of one exactly-once
pipeline is the input of the next. :func:`refresh_derived` /
:func:`rebuild_derived` are generic over any per-key aggregate
(``aggregate(state_df, key) -> one row per key``); the conversation
rollup (:func:`rollup_state`) and latest-turn serving index
(:func:`index_state`) are the bundled instances.

* **cursor** — the derived table's own committed-epoch log doubles as the
  feed cursor: a refresh covering source epochs ``[a, b]`` commits into the
  derived table under epoch id ``b``, so ``derived.last_committed_epoch``
  IS the resume point. Crash after merge-commit → rerun is a no-op; crash
  before → rerun re-folds the same range. No side-channel state.
* **O(changed) refresh, not O(table)** — the affected conversation set
  comes from ``read_changes`` (O(changes in range)); recompute reads ONLY
  the buckets those conversations hash to (``read(buckets=…)``), then
  semi-joins the broadcast affected set. At 4096 buckets and a bounded
  refresh cadence that is a small fraction of a 100 TB table per refresh.
* **monotone LWW order** — the derived row's order column is the REFRESH
  epoch, not the conversation's (ts, lsn): deleting the turn that held a
  conversation's max lsn makes the recomputed aggregate's (ts, lsn) go
  BACKWARDS, and an order built on them would let the stale rollup win at
  read time. Refresh epochs only grow, so later refreshes always win
  (regression-pinned in tests/test_derived.py).

Cursor integrity — the cases the numeric cursor cannot express fail LOUDLY
instead of silently diverging:

* **bootstrap loads** commit a non-numeric epoch ("bootstrap-0") and write
  files the changes feed never serves; ``refresh_derived`` refuses until
  one ``rebuild_derived`` has absorbed that state (tracked by a cover
  marker in the derived table's own epoch log).
* **source restore** moves the source cursor backwards; ``refresh_derived``
  raises so the operator restores the derived table to its matching
  version (it is a SnapshotTable — ``restore`` works on it) or rebuilds.
* **checkpoint-lineage restarts** reuse low numeric batch ids under a new
  namespace. When the new lineage merely replays the same changelog (the
  engine's documented overlap semantics) the folded state is already
  correct; if it delivers genuinely NEW data under batch ids at or below
  the cursor, run ``rebuild_derived`` once — the same escape hatch as a
  truncated feed.

Correctness invariant (driver-checked by the ``cdc_derived_rollup`` and
``cdc_derived_index`` oracle entries): fold-of-deltas ≡
recompute-from-scratch — any split of the epoch range into refreshes lands
the same derived state as one full build.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .lake.snapshot_table import (
    MergeStats,
    SnapshotTable,
    _bucket_expr,
    _split_epoch_key,
)

#: per-conversation rollup maintained via :func:`rollup_state`
ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("live_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("last_ts", T.TimestampNTZType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("refresh_epoch", T.LongType()),
    ]
)

#: per-conversation latest-turn serving index via :func:`index_state`
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("last_turn_idx", T.IntegerType()),
        T.StructField("last_role", T.StringType()),
        T.StructField("last_text", T.StringType()),
        T.StructField("refresh_epoch", T.LongType()),
    ]
)


#: per-conversation MinHash-LSH near-dup index via :func:`lsh_index_state`
#: (band count kept in lockstep with queries._N_HASHES // queries._BAND_R)
DEDUP_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_shingles", T.LongType()),
        *[T.StructField(f"band_{b}", T.StringType()) for b in range(4)],
        T.StructField("refresh_epoch", T.LongType()),
    ]
)


def create_derived_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    key: tuple[str, ...] = ("conv_id",),
    n_buckets: int = 8,
    mode: str = "mor",
) -> SnapshotTable:
    """CREATE IF NOT EXISTS a derived table maintained by
    :func:`refresh_derived`: keyed by ``key``, LWW-ordered by
    ``refresh_epoch`` (see module docstring for why NOT (ts, lsn)).
    ``schema`` must contain the key columns and a ``refresh_epoch long``."""
    return SnapshotTable.create(
        spark,
        path,
        schema,
        n_buckets=n_buckets,
        key=key,
        order=("refresh_epoch",),
        mode=mode,
    )


def create_conversation_rollup(
    spark: SparkSession, path: str, n_buckets: int = 8, mode: str = "mor"
) -> SnapshotTable:
    """The per-conversation rollup table (``ROLLUP_SCHEMA``)."""
    return create_derived_table(
        spark, path, ROLLUP_SCHEMA, n_buckets=n_buckets, mode=mode
    )


def create_conversation_index(
    spark: SparkSession, path: str, n_buckets: int = 8, mode: str = "mor"
) -> SnapshotTable:
    """The per-conversation latest-turn serving index (``INDEX_SCHEMA``)."""
    return create_derived_table(
        spark, path, INDEX_SCHEMA, n_buckets=n_buckets, mode=mode
    )


def create_dedup_index(
    spark: SparkSession, path: str, n_buckets: int = 8, mode: str = "mor"
) -> SnapshotTable:
    """The per-conversation MinHash-LSH near-dup index table
    (``DEDUP_INDEX_SCHEMA``), maintained via :func:`lsh_index_state`."""
    return create_derived_table(
        spark, path, DEDUP_INDEX_SCHEMA, n_buckets=n_buckets, mode=mode
    )


def lsh_index_state(state: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-conversation MinHash-LSH index row — the INCREMENTAL near-dup
    surface: assemble each conversation's live turns (ordered by
    ``turn_idx``, the input_hint's stable-turn-ordering invariant) into one
    document, derive its word-3-gram shingle set, and reduce that to
    ``n_shingles`` plus one bucket key per MinHash band (the same
    ``md5(j:shingle)`` parity form as the batch ``dedup_minhash_lsh``
    pipeline, ``queries.py``).

    Run through :func:`refresh_derived`, this maintains a near-dup index
    at O(changed conversations) per refresh — the 100 TB shape: a corpus
    under CDC churn never re-shingles itself end-to-end; only edited
    conversations recompute, and candidate pairs come from equi-joining
    the (bounded) band buckets of the index, never an all-pairs pass.
    Everything is map-side per conversation past the one turn-assembly
    hash aggregate: shingles, signatures, and band keys are pure column
    arithmetic over the assembled text (no explode, no per-row Python).
    Conversations with fewer than 3 tokens carry NULL band keys and
    ``n_shingles = 0`` (nothing to hash — they can near-dup nothing)."""
    from .queries import _BAND_R, _N_HASHES, _SHINGLE_EXPR

    doc = state.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("_doc")
    )
    toks = F.split(F.trim(F.col("_doc")), " ")
    shset = F.when(
        F.size("_toks") >= 3, F.array_distinct(F.expr(_SHINGLE_EXPR))
    ).otherwise(F.array().cast("array<string>"))
    wide = doc.select(key, toks.alias("_toks")).select(
        key, shset.alias("_shset")
    )

    def _hash_fn(j: int):
        prefix = f"{j}:"
        # single-arg lambda on purpose (F.transform treats 2-arg as
        # (element, index)) — same convention as queries._band_signatures
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    sigs = {
        j: F.array_min(F.transform(F.col("_shset"), _hash_fn(j)))
        for j in range(_N_HASHES)
    }
    bands = []
    for bnd in range(_N_HASHES // _BAND_R):
        parts = [
            F.concat(F.lit(f"{j}:"), sigs[j])
            for j in range(bnd * _BAND_R, (bnd + 1) * _BAND_R)
        ]
        bands.append(
            F.when(F.size("_shset") > 0, F.concat_ws("|", *parts)).alias(
                f"band_{bnd}"
            )
        )
    return wide.select(
        key, F.size("_shset").cast("long").alias("n_shingles"), *bands
    )


lsh_index_state.required_columns = ["turn_idx", "text"]


def rollup_state(state: DataFrame, key: str = "conv_id") -> DataFrame:
    """The rollup aggregate over a (slice of) source live state — shared by
    the incremental refresh and the from-scratch oracle recompute."""
    return state.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("live_turns"),
        F.sum(F.coalesce(F.length("text"), F.lit(0)))
        .cast("long")
        .alias("total_chars"),
        F.max("ts").alias("last_ts"),
        F.max("lsn").cast("long").alias("max_lsn"),
    )


#: columns each built-in aggregate actually consumes — refresh/rebuild pass
#: these to ``read(columns=…)`` so the recompute scan never reads payload
#: columns the aggregate ignores (manifest-level pruning; key/order columns
#: are always included by read()). Custom aggregates without the attribute
#: get the full scan.
rollup_state.required_columns = ["text", "ts", "lsn"]


def index_state(state: DataFrame, key: str = "conv_id") -> DataFrame:
    """Latest-turn serving-index aggregate: the live row with the highest
    ``turn_idx`` per conversation (unique per key, so ``max_by`` is
    deterministic)."""
    return state.groupBy(key).agg(
        F.max("turn_idx").cast("int").alias("last_turn_idx"),
        F.max_by("role", "turn_idx").alias("last_role"),
        F.max_by("text", "turn_idx").alias("last_text"),
    )


index_state.required_columns = ["turn_idx", "role", "text"]


def _bootstrap_cover_key(source: SnapshotTable) -> str | None:
    """Cover-marker id for the source's non-numeric (bootstrap-style)
    committed epochs — the state the changes feed cannot serve. None when
    the source has none."""
    boot = sorted(
        str(k)
        for k in source._snapshot.get("committed_epochs", [])
        if _split_epoch_key(str(k)) is None
    )
    return ("cover:" + "|".join(boot)) if boot else None


def _live(
    state: DataFrame, key: str, order_epoch: int, aggregate: Callable
) -> DataFrame:
    return (
        aggregate(state, key)
        .withColumn("refresh_epoch", F.lit(order_epoch).cast("long"))
        .withColumn("op", F.lit("update"))
    )


def _merge_with_tombstones(
    derived: SnapshotTable,
    live: DataFrame,
    gone_keys: DataFrame,
    key: str,
    order_epoch: int,
    epoch_id: int | str,
) -> MergeStats:
    """Shared tail of both maintenance paths: tombstone ``gone_keys``
    (NULL payload driven by the DERIVED table's schema — one place,
    whatever the aggregate), union with ``live``, MERGE exactly-once under
    ``epoch_id``."""
    gone = gone_keys
    for f in derived.schema.fields:
        if f.name in (key, "refresh_epoch"):
            continue
        gone = gone.withColumn(f.name, F.lit(None).cast(f.dataType))
    gone = gone.withColumn(
        "refresh_epoch", F.lit(order_epoch).cast("long")
    ).withColumn("op", F.lit("delete"))
    batch = live.unionByName(gone.select(*live.columns))
    return derived.merge_changes(batch, epoch_id=epoch_id)


def refresh_derived(
    source: SnapshotTable,
    derived: SnapshotTable,
    aggregate: Callable = rollup_state,
    to_epoch: int | None = None,
) -> MergeStats | None:
    """Fold source epochs ``(derived.last_committed_epoch, to_epoch]`` into
    the derived table, exactly once. Returns the merge stats, or ``None``
    when the derived table is already caught up. ``to_epoch=None`` = the
    source's latest committed epoch. ``aggregate(state_df, key)`` must
    return one row per key with columns matching the derived schema
    (minus ``refresh_epoch``).

    Affected conversations are recomputed from source state (delete +
    re-aggregate per key — robust to ANY change shape, including the
    non-incrementable aggregates like max); conversations whose every turn
    is gone become tombstones in the derived table.

    Raises ``FileNotFoundError`` when the feed cannot serve the pending
    state (vacuum-truncated range, clone feed floor, unabsorbed bootstrap
    load) — :func:`rebuild_derived` is the escape hatch, and callers may
    catch this type to fall back automatically. Raises ``ValueError`` when
    the source cursor moved BACKWARDS (a ``restore``) — rebuild is NOT the
    remedy there; restore the derived table too. See the module docstring
    for the checkpoint-lineage caveat.
    """
    last = derived.last_committed_epoch
    latest = source.last_committed_epoch if to_epoch is None else int(to_epoch)
    cover = _bootstrap_cover_key(source)
    if cover is not None and not derived.is_epoch_committed(cover):
        # same family as a vacuum-truncated feed (FileNotFoundError): the
        # feed cannot serve this state, and rebuild_derived is the remedy —
        # callers may catch this type and fall back automatically. The
        # backwards-cursor case below is ValueError on purpose: rebuild is
        # NOT its remedy and it must not be auto-absorbed.
        raise FileNotFoundError(
            "source holds bootstrap-loaded state the changes feed cannot "
            "serve; run rebuild_derived once to absorb it, then resume "
            "incremental refreshes"
        )
    if latest < last:
        raise ValueError(
            f"source epoch cursor moved backwards (latest {latest} < derived"
            f" cursor {last}) — a restore() rolled the source below the "
            f"derived table's fold point; restore the derived table to its "
            f"matching earlier version too, or rebuild into a fresh one"
        )
    if latest == last:
        return None
    key = source.key[0]
    # columns=[]: the affected-key probe needs only the merge key — the
    # pending deltas' payload columns (the transcripts) are never scanned
    feed = source.read_changes(last + 1, latest, columns=[])
    affected = feed.select(key).distinct()
    # bucket pruning: the affected set hashes to a (often small) subset of
    # buckets — read only those. The bucket ids are O(n_buckets) to collect.
    b_ids = sorted(
        r["b"]
        for r in affected.select(
            _bucket_expr(key, source.n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    state = source.read(
        buckets=b_ids,
        columns=getattr(aggregate, "required_columns", None),
    )
    live = _live(
        state.join(F.broadcast(affected), key, "left_semi"),
        key,
        latest,
        aggregate,
    )
    gone_keys = affected.join(live.select(key), key, "left_anti")
    return _merge_with_tombstones(derived, live, gone_keys, key, latest, latest)


def rebuild_derived(
    source: SnapshotTable,
    derived: SnapshotTable,
    aggregate: Callable = rollup_state,
) -> MergeStats | None:
    """Full-recompute fallback for the states the incremental feed cannot
    serve: a vacuum-truncated range, a ``clone()``d source whose feed floor
    sits above the derived cursor, a bootstrap-loaded source (the bootstrap
    files never enter the feed — absorbing them is recorded as a cover
    marker in the derived epoch log so :func:`refresh_derived` knows), or a
    checkpoint-lineage restart that delivered new data under old batch ids.

    One O(table) pass: re-aggregate every conversation from live source
    state, upsert all, and tombstone derived keys whose conversation no
    longer exists. Commits under the source's latest numeric epoch id when
    one is pending (catching the incremental cursor up), else under the
    bootstrap cover marker. Idempotent (rerun no-ops); returns ``None``
    when there is nothing to absorb.

    NOT the recovery path after ``source.restore()``: a restore moves the
    source's epoch cursor BACKWARDS, which this cursor scheme cannot
    express — restore the derived table to its matching earlier version
    too (it is a SnapshotTable; ``restore`` works on it), or start a fresh
    derived table.
    """
    last = derived.last_committed_epoch
    latest = source.last_committed_epoch
    cover = _bootstrap_cover_key(source)
    covered = cover is None or derived.is_epoch_committed(cover)
    if covered and latest <= last:
        return None
    key = source.key[0]
    live = _live(
        source.read(columns=getattr(aggregate, "required_columns", None)),
        key,
        latest,
        aggregate,
    )
    gone_keys = (
        derived.read().select(key).join(live.select(key), key, "left_anti")
    )
    epoch_id: int | str = latest if latest > last else cover
    st = _merge_with_tombstones(
        derived, live, gone_keys, key, latest, epoch_id
    )
    if not covered and epoch_id != cover:
        # the content went in under the numeric epoch; record the cover
        # marker with an empty merge so refresh_derived stops refusing.
        # Crash between the two commits is safe: the next rebuild re-runs
        # the (idempotent) content merge under the cover id.
        empty = derived.read().limit(0).withColumn("op", F.lit("update"))
        derived.merge_changes(empty, epoch_id=cover)
    return st


def refresh_rollup(
    source: SnapshotTable,
    derived: SnapshotTable,
    to_epoch: int | None = None,
) -> MergeStats | None:
    """:func:`refresh_derived` with the conversation-rollup aggregate."""
    return refresh_derived(source, derived, rollup_state, to_epoch)


def rebuild_rollup(
    source: SnapshotTable, derived: SnapshotTable
) -> MergeStats | None:
    """:func:`rebuild_derived` with the conversation-rollup aggregate."""
    return rebuild_derived(source, derived, rollup_state)

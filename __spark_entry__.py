"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the engine flagship: a changelog derived
deterministically from the sf-dir ``events`` table, replayed through the
exactly-once CDC MERGE pipeline (LSN-interleaved epochs, mid-replay schema
evolution, registry maintenance) at sf0.001 scale — in the merge-on-read
storage mode (O(batch) epoch appends + bucket-local read-time LWW), the
mode whose asymptotics survive 10^10 events. ``queries()`` covers
SURVEY.md §2 operator-by-operator plus the training-data pipeline operators
(dedup / similarity / text analysis / multimodal); EVERY entry — including
the flagship replay, its copy-on-write twin, lineage accounting for both
modes, the conversations registry (with dimension LEVEL columns), and
replay idempotence — has a DuckDB oracle in ``oracle_sql()`` with matching
column names (verified locally via tools/verify_oracles.py).

Ordering contract (round 5): the external harness hash-verifies only the
FIRST 50 entries, so ``_PRIORITY`` below front-loads the entries with the
least prior driver evidence plus the flagship family; the rotation is
pinned by tests/test_entry_contract.py and the full 78 remain locally
verified at sf0.01 AND sf0.1 every round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mas_scada_bulkingest_spark.cdc_queries import CDC_QUERIES, q_cdc_replay_state
from mas_scada_bulkingest_spark.queries import SQL_QUERIES

# The driver's correctness harness checks the FIRST 50 ``queries()`` entries
# against their DuckDB oracles (rows + schema + value-hash at sf0.01).  Dict
# insertion order therefore decides which entries receive hard driver
# evidence each round.  ``_PRIORITY`` front-loads (a) the entries added in
# rounds 3–4 that have never had a driver-green row (r4 coverage stopped at
# ``cdc_routed_union``), then (b) the flagship CDC-state family and the most
# intricate pipeline operators.  Long-stable scalar/veteran entries (green in
# CORRECTNESS_r01–r04) rotate behind the window; they remain fully present in
# ``queries()``/``oracle_sql()`` and in the local sweep
# (tools/verify_oracles.py covers all entries every run).
_PRIORITY = [
    # -- never driver-verified (added after the r4 50-entry window) --
    "cdc_windowed_state",
    "cdc_clustered_scan",
    "debezium_parse",
    "cdc_changes_feed",
    "cdc_stream_feed",
    "cdc_cdf_typed",
    "cdc_ivm_rollup",
    "cdc_derived_rollup",
    "cdc_derived_index",
    "cdc_dedup_index",
    "cdc_constraints",
    "cdc_quarantine",
    "cdc_generated",
    "cdc_delete_where",
    "cdc_lineage",
    "cdc_lineage_mor",
    "conversations_registry",
    "conversation_progress",
    "cdc_idempotent_replay",
    "multimodal_stub",
    "stream_watermark_rollup",
    "cdc_asof_enrich",
    "cdc_scd2_history",
    "cdc_sparse_state",
    "conversation_assembly",
    "cdc_colocated_join",
    "cdc_update_where",
    "cdc_cdf_preimages",
    # -- flagship CDC-state family (keep under driver evidence every round) --
    "cdc_replay_state",
    "cdc_replay_state_cow",
    "cdc_projected_state",
    "cdc_wap_state",
    "cdc_branch_state",
    "cdc_txn_state",
    "cdc_replica_state",
    "cdc_bootstrap_tail",
    "cdc_routed_union",
    # -- most intricate pipeline operators (multi-stage / capped joins) --
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "dedup_embed_cosine",
    "embed_ivf_search",
    "embed_ann_search",
    "decontaminate",
    "pack_sequences",
    "dedup_chunks",
    "sessionize",
    "events_cube",
    "corpus_mixture",
]


def _ordered() -> dict:
    merged = {**SQL_QUERIES, **CDC_QUERIES}
    missing = [k for k in _PRIORITY if k not in merged]
    if missing:  # fail loudly if the registry and priority list drift
        raise KeyError(f"_PRIORITY names unknown queries: {missing}")
    out = {k: merged[k] for k in _PRIORITY}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


_ALL = _ordered()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: changelog replay → exactly-once MERGE → final transcripts."""
    return q_cdc_replay_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}

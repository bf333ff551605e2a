"""Pins the driver-contract ordering of ``__spark_entry__.queries()``.

The external correctness harness hash-verifies the FIRST 50 entries of
``queries()`` against ``oracle_sql()`` at sf0.01.  Round 4's window stopped
at ``cdc_routed_union``, leaving the 28 entries added afterwards with only
local-replica evidence (VERDICT.md round-4 item 1).  This test pins the
round-5 fix: every previously-uncovered entry must sit inside the first 50,
and the registry stays complete (no entry lost in the reorder).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_under_test", mod)
    spec.loader.exec_module(mod)
    return mod


NEVER_DRIVER_VERIFIED_BEFORE_R5 = [
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
]

FLAGSHIP_FAMILY = [
    "cdc_replay_state",
    "cdc_replay_state_cow",
    "cdc_projected_state",
    "cdc_wap_state",
    "cdc_branch_state",
    "cdc_txn_state",
    "cdc_replica_state",
    "cdc_bootstrap_tail",
    "cdc_routed_union",
]


def test_uncovered_entries_inside_driver_window():
    entry = _load_entry()
    keys = list(entry.queries())
    first50 = set(keys[:50])
    missing = [k for k in NEVER_DRIVER_VERIFIED_BEFORE_R5 if k not in first50]
    assert not missing, f"entries still outside the driver's 50-entry window: {missing}"


def test_flagship_family_stays_inside_window():
    entry = _load_entry()
    first50 = set(list(entry.queries())[:50])
    missing = [k for k in FLAGSHIP_FAMILY if k not in first50]
    assert not missing, missing


def test_registry_complete_and_oracles_aligned():
    entry = _load_entry()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) == 78
    # every oracle key must name a query; oracles may be a subset (weaker
    # rows-only check for genuinely non-SQL-expressible entries)
    assert set(oracles) <= set(qs)
    # the reorder must not drop or duplicate anything
    assert len(set(qs)) == len(qs)

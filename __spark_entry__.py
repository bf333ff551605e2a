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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mas_scada_bulkingest_spark.cdc_queries import CDC_QUERIES, q_cdc_replay_state
from mas_scada_bulkingest_spark.queries import SQL_QUERIES

_ALL = {**SQL_QUERIES, **CDC_QUERIES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: changelog replay → exactly-once MERGE → final transcripts."""
    return q_cdc_replay_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}

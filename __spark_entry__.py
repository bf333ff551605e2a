"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the engine flagship: deterministic changelog replay
through the exactly-once CDC MERGE pipeline at sf0.001 scale. ``queries()``
covers SURVEY.md §2 operator-by-operator plus the training-data pipeline
operators (dedup / similarity / text analysis / multimodal); each SQL-
expressible entry has a DuckDB oracle in ``oracle_sql()`` with matching
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

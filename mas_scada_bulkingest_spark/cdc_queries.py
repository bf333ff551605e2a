"""CDC-engine queries for the correctness harness + multimodal plumbing.

The CDC entries exercise the actual engine (changelog generation → epoch
replay → exactly-once MERGE → lineage) rather than a SQL-expressible
operator, so they are registered without a DuckDB oracle (the driver records
a rows-only check); their correctness gate is the pytest suite, which replays
the same changelog against the single-threaded pandas oracle reducer
(tests/test_changelog_and_oracle.py, tests/test_merge_exactly_once.py).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lake.snapshot_table import SnapshotTable
from .pipeline import create_transcripts_table
from .sources.changelog_gen import generate_changelog
from .streaming.driver import replay_batches

# One replay per (process, sf_dir): the generated changelog and final table
# are deterministic, so memoizing is purely a speed optimization.
_REPLAY_CACHE: dict[str, str] = {}

_SF_CONVS = {"sf0.001": 120, "sf0.01": 400, "sf0.1": 1200}


def _n_convs(sf_dir: str) -> int:
    return _SF_CONVS.get(os.path.basename(os.path.normpath(sf_dir)), 400)


def _replayed_table(spark: SparkSession, sf_dir: str) -> SnapshotTable:
    key = os.path.normpath(sf_dir)
    if key in _REPLAY_CACHE:
        return SnapshotTable(spark, _REPLAY_CACHE[key])
    work = tempfile.mkdtemp(prefix="cdc_replay_")
    changes = os.path.join(work, "changes")
    table_path = os.path.join(work, "transcripts")
    generate_changelog(changes, n_convs=_n_convs(sf_dir), seed=42)
    table = create_transcripts_table(spark, table_path, n_buckets=8)
    replay_batches(
        spark, changes, table, files_per_epoch=2, hot_key_threshold=1000
    )
    _REPLAY_CACHE[key] = table_path
    return table


def q_cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final transcripts table after full changelog replay (engine flagship).

    Deterministic: seeded generator + LWW semantics ⇒ identical rows every
    run. Timestamps rendered as strings for a stable cross-system hash.
    """
    table = _replayed_table(spark, sf_dir)
    df = table.read()
    cols = [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "lsn",
    ]
    if "metadata" in df.columns:
        cols.append("metadata")
    return df.select(*cols)


def q_cdc_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch lineage rollup (north_rule resumability evidence)."""
    table = _replayed_table(spark, sf_dir)
    return (
        table.lineage()
        .groupBy("epoch_id")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("applied").alias("applied"),
            F.sum("skipped").alias("skipped"),
            F.sum("deleted").alias("deleted"),
            F.max("max_lsn").alias("max_lsn"),
        )
    )


def q_cdc_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay every committed epoch a second time; report that all were
    no-ops (exactly-once evidence as a queryable result)."""
    table = _replayed_table(spark, sf_dir)
    from .pipeline import apply_changes  # local import to avoid cycle

    epochs = sorted(table.committed_epochs, key=lambda e: int(e))
    rows = []
    for e in epochs:
        st = apply_changes(table, table.read().limit(0), e)
        rows.append((int(e), bool(st.was_noop), int(st.applied)))
    schema = T.StructType(
        [
            T.StructField("epoch_id", T.LongType()),
            T.StructField("was_noop", T.BooleanType()),
            T.StructField("applied", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# multimodal: opaque binary payloads + typed metadata via mapInPandas.
# The decode step (image/audio libs absent in this container) is a
# deterministic fake clearly marked below; the Spark-side plumbing — binary
# column, Arrow batches, schema, partition-preserving mapInPandas — is real.
# ---------------------------------------------------------------------------

_MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def q_multimodal_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: encode text as an opaque blob, ship through
    Arrow-batched ``mapInPandas``, extract typed metadata.

    STUB NOTE: ``_fake_decode`` stands in for a real image/audio decoder
    (PIL/librosa not installed); it derives deterministic pseudo-dimensions
    from the payload length so the full distributed plumbing is testable.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def _fake_decode(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "media_type": "text/fake-image",
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                }
            )

    return payload.mapInPandas(_fake_decode, schema=_MM_SCHEMA)


_SQL_MULTIMODAL_STUB = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       'text/fake-image' AS media_type,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 AS INT) AS height
FROM documents
"""

#: name -> (spark_fn, oracle_sql | None)
CDC_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "cdc_replay_state": (q_cdc_replay_state, None),
    "cdc_lineage": (q_cdc_lineage, None),
    "cdc_idempotent_replay": (q_cdc_idempotent_replay, None),
    "multimodal_stub": (q_multimodal_stub, _SQL_MULTIMODAL_STUB),
}

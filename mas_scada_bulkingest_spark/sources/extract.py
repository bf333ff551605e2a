"""Raw extract utilities (SURVEY.md §2 S5, §3.2 — the ``SampleData`` path).

The reference's bootstrap flow dumps source tables to CSV with hand-rolled
LIMIT-offset pagination, a once-written header line, and lossy comma
sanitization (``value.replaceAll(",", " ")``, DBConnector.java:534-631).
Spark's distributed scan + CSV writer replaces the pagination and quoting
replaces the sanitization; ``lossy_commas=True`` reproduces the reference's
comma-to-space rewrite bit-for-bit for fidelity tests (F11 note: the
behaviors differ — quoting is lossless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def extract_raw_csv(
    df: DataFrame,
    out_dir: str,
    lossy_commas: bool = False,
    single_file: bool = False,
) -> None:
    """Dump a DataFrame to headered CSV (the ``extractRawData`` analog)."""
    if lossy_commas:
        cols = [
            F.regexp_replace(F.col(f.name), ",", " ").alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
        df = df.select(*cols)
    writer = (df.coalesce(1) if single_file else df).write.option("header", "true")
    writer.mode("overwrite").csv(out_dir)


def sample_schema(spark: SparkSession, path: str, n: int = 100) -> dict:
    """Discover a source's schema from a sample (the reference derives its
    type registration from sampled rows, mkdocs/docs/overview.md:14; dynamic
    source-schema discovery at DBConnector.java:170-184)."""
    df = spark.read.parquet(path)
    sample = df.limit(n)
    return {
        "fields": [
            {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
            for f in df.schema.fields
        ],
        "sample_rows": sample.count(),
    }

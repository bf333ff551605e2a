"""Additive schema evolution (SURVEY.md §1.3).

The reference passes newly appearing source columns through by uppercased
name (DBConnector.java:453-455) — its (weak) schema evolution. The new engine
formalizes that: when a micro-batch arrives with columns the target table has
not seen, the target schema is extended additively (never dropped, never
retyped); existing rows read NULL for new columns. With an Iceberg catalog
this is ``ALTER TABLE … ADD COLUMNS``; the bundled snapshot table records the
merged schema in its snapshot metadata and reads mixed-schema parquet with
``mergeSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_schemas(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Additive union: base fields (order preserved) + new incoming fields.

    A field present in both must have the same dataType; type *changes* are
    rejected (the reference never retypes either — destination DDL is fixed,
    MonitorTable.java:49-120).
    """
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        if f.name in by_name:
            if by_name[f.name].dataType != f.dataType:
                raise TypeError(
                    f"schema evolution rejected: column {f.name!r} would change "
                    f"type {by_name[f.name].dataType} -> {f.dataType}"
                )
        else:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
    return T.StructType(out)


def align_schemas(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed NULLs,
    column order follows ``target``. The DataFrame analog of
    ``unionByName(allowMissingColumns=True)`` against a fixed schema."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)

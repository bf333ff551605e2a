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


#: lossless promotion lattice for ``allow_widening`` (Delta/Iceberg "type
#: widening"): integral chain, float→double, and small-integral→double
#: (every int32 is exact in a double). long→double is EXCLUDED (lossy above
#: 2^53), as is anything across unrelated types.
_WIDEN_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_TO_DOUBLE = {"byte", "short", "integer", "float"}


def _widened(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The wider of two types under the lossless lattice, or None when the
    pair is not widenable."""
    an, bn = a.typeName(), b.typeName()
    if an in _WIDEN_RANK and bn in _WIDEN_RANK:
        return a if _WIDEN_RANK[an] >= _WIDEN_RANK[bn] else b
    if {an, bn} <= {"float", "double"}:
        return T.DoubleType()
    if (an == "double" and bn in _TO_DOUBLE) or (bn == "double" and an in _TO_DOUBLE):
        return T.DoubleType()
    return None


def merge_schemas(
    base: T.StructType, incoming: T.StructType, allow_widening: bool = False
) -> T.StructType:
    """Additive union: base fields (order preserved) + new incoming fields.

    A field present in both must have the same dataType by default; type
    *changes* are rejected (the reference never retypes either — destination
    DDL is fixed, MonitorTable.java:49-120). ``allow_widening=True``
    additionally accepts LOSSLESS promotions (``_widened``: byte→short→int→
    long, float→double, small-integral→double — the Delta/Iceberg
    type-widening feature a long-lived CDC table eventually needs when the
    source ALTERs a column, e.g. MySQL INT → BIGINT): the merged field takes
    the wider type, in EITHER direction (a narrower incoming batch simply
    casts up). Existing parquet files are NOT rewritten — Spark's parquet
    readers upcast at scan time (probed on this version; regression-pinned
    in tests/test_type_widening.py)."""
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        if f.name in by_name:
            have = by_name[f.name].dataType
            if have != f.dataType:
                wide = _widened(have, f.dataType) if allow_widening else None
                if wide is None:
                    raise TypeError(
                        f"schema evolution rejected: column {f.name!r} would "
                        f"change type {have} -> {f.dataType}"
                        + (
                            " (not a lossless widening)"
                            if allow_widening
                            else ""
                        )
                    )
                if wide != have:
                    out[out.index(by_name[f.name])] = T.StructField(
                        f.name, wide, nullable=by_name[f.name].nullable
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

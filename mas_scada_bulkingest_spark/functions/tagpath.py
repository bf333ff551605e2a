"""Scalar helpers mirroring the reference's hard-coded row transforms
(SURVEY.md F1-F10) as pure Column expressions.

Every one of these is a whole-stage-codegen'd builtin composition — the
reference computed them row-at-a-time in Java (DBConnector.java:411-498).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def last_segment(col: Column | str, sep: str = "/") -> Column:
    """F3: ``tagpath.split(sep)[last]`` (reference DBConnector.java:491-492)."""
    return F.element_at(F.split(_c(col), sep), -1)


def null_default(col: Column | str, default) -> Column:
    """F9: the reference's null→0/0.0 bind-time coercion (DBHelper.java:135-177)."""
    return F.coalesce(_c(col), F.lit(default))


def tag_from_alarm_source(col: Column | str) -> Column:
    """F10: tagpath from ``prov:default:/tag:<tagpath>:/alm:<alarm>``
    (reference alarmSqlTemplate.sql:4, done there with substring/instr)."""
    return F.regexp_extract(_c(col), r"prov:default:/tag:(.*?):/alm:", 1)


def ackby_from_alarm_source(col: Column | str) -> Column:
    """F10: ack user from a ``…usr:<user>`` suffix (alarmSqlTemplate.sql:9-10)."""
    return F.regexp_extract(_c(col), r"usr:(.*)$", 1)


def apply_column_mapping(
    df,
    mapping: dict[str, str] | None = None,
    constants: dict[str, object] | None = None,
    discard: list[str] | None = None,
    upper_passthrough: bool = True,
):
    """F2/P2/P3: the reference's ``getSourceMap`` column surface
    (DBConnector.java:426-461 + the ``renameColumns``/``discardColumns``
    config documented in mkdocs/docs/data.md:33-60) as one declarative
    projection:

    * ``mapping``: explicit source→dest renames (``tagpath``→``TAG`` style);
    * ``discard``: source columns dropped entirely;
    * every other column passes through with its name UPPERCASED (the
      reference's dynamic-column behavior for newly appearing source
      columns) unless ``upper_passthrough=False``;
    * ``constants``: injected literal columns (``EVENTTYPE``/``FORMAT``
      analog, DBConnector.java:422-424).
    """
    mapping = mapping or {}
    constants = constants or {}
    drop = set(discard or [])
    cols = []
    for name in df.columns:
        if name in drop:
            continue
        if name in mapping:
            cols.append(F.col(name).alias(mapping[name]))
        else:
            cols.append(
                F.col(name).alias(name.upper() if upper_passthrough else name)
            )
    for cname, value in constants.items():
        cols.append(F.lit(value).alias(cname))
    return df.select(*cols)


def path_levels(col: Column | str, n_levels: int = 8, sep: str = "/") -> list[Column]:
    """F4: dimension columns ``LEVEL_0..LEVEL_{n-1}`` from path segments.

    The reference registers each tagpath segment as a dimension LEVEL_i
    (Dimension.java:142-148; EntityType.java:111-118 caps at LEVEL_7).
    Missing segments are NULL (``element_at`` beyond length), matching the
    registration's sparse behavior.
    """
    parts = F.split(_c(col), sep)
    return [
        F.when(F.size(parts) > i, F.element_at(parts, i + 1))
        .otherwise(F.lit(None).cast("string"))
        .alias(f"LEVEL_{i}")
        for i in range(n_levels)
    ]

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

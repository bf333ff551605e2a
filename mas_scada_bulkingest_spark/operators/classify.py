"""First-match-wins regex classification with discard patterns (SURVEY.md F12/P5).

Re-expresses the reference's ``ParseTagname`` (ParseTagname.java:55-105): an
ordered list of ``(entity_type, pattern)`` pairs is evaluated top-down; the
first pattern that *fully* matches wins, unless a discard pattern also fully
matches (then the value falls through to later patterns / the default). Java's
``Matcher.matches()`` is anchored, so every pattern is wrapped ``^(?:p)$``
before compiling into a single chained ``when`` Column expression — pure
Catalyst, whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def load_classifier_config(path: str) -> tuple[list[tuple[str, str]], list[str], str | None]:
    """Load ``(patterns, discard, default_type)`` from a JSON config file —
    the engine analog of the reference's ``connection.json`` classifier
    surface (Config.java:173-179 feeding ParseTagname.java:36-74).

    Format::

        {"patterns": [["type", "regex"], ...],
         "discard": ["regex", ...],
         "default_type": "other"}

    Feed the result straight into :func:`classify_expr`.
    """
    with open(path) as f:
        cfg = json.load(f)
    patterns = [(str(t), str(p)) for t, p in cfg.get("patterns", [])]
    discard = [str(d) for d in cfg.get("discard", [])]
    return patterns, discard, cfg.get("default_type")


def _anchor(pattern: str) -> str:
    return f"^(?:{pattern})$"


def classify_expr(
    col: Column | str,
    patterns: Sequence[tuple[str, str]],
    discard: Sequence[str] = (),
    default_type: str | None = None,
) -> Column:
    """Build a classification Column.

    ``patterns``: ordered ``(type, regex)`` pairs, first full match wins.
    ``discard``: values fully matching any of these are excluded from a
    pattern's match *at that position* — in the reference a discarded tagname
    falls through the whole list (ParseTagname.java:84-97), so here a discard
    match forces the default (or NULL).
    ``default_type``: assigned when nothing matches (the reference uses the
    last pattern's type as default when configured, ParseTagname.java:63-66).
    """
    c = F.col(col) if isinstance(col, str) else col
    discarded = None
    for d in discard:
        m = c.rlike(_anchor(d))
        discarded = m if discarded is None else (discarded | m)

    expr: Column | None = None
    for etype, pattern in patterns:
        cond = c.rlike(_anchor(pattern))
        if discarded is not None:
            cond = cond & ~discarded
        expr = F.when(cond, F.lit(etype)) if expr is None else expr.when(cond, F.lit(etype))

    default = F.lit(default_type) if default_type is not None else F.lit(None).cast("string")
    if expr is None:
        return default
    return expr.otherwise(default)

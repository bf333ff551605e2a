"""SCD2 (slowly-changing-dimension type 2) history derivation from a
change log.

The reference keeps only current state: its dimension sinks overwrite
in place (DBConnector.java REGISTER/UPDATE paths) and its fact sink
upserts behind a unique index (MonitorTable.java:70-76) — history is
lost on every update. A CDC engine that already tails the full binlog
can keep it for free: every change *opens* a version valid from its
event time, and the next change to the same key (of ANY type,
including a delete) *closes* it.

Semantics, per key ordered by the ``(ts, lsn)`` order tuple:

* an upsert row emits a version: ``valid_from = ts``,
  ``valid_to = next change's ts`` (NULL while current);
* a delete row emits nothing but still closes the preceding version
  (its ts becomes that version's ``valid_to``);
* ``is_current`` is true iff no later change exists — a key whose last
  change is a delete therefore has NO current version, matching the
  live-state table.

One shuffle (hash by key) + one per-partition sort; ``lead`` is a
single-pass window — the same cost as the LWW collapse's window
parity form, and the standard shape for SCD2 at any scale. Exact
duplicate deliveries must be deduped first (the order tuple is unique
after ``dedup_exact``/LWW preprocessing; duplicate tuples would create
zero-width versions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    order: Sequence[str] = ("ts", "lsn"),
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Versioned history rows from a change log (see module doc).

    Output: every non-delete change row plus ``valid_from`` /
    ``valid_to`` (both of ``order[0]``'s type, ``valid_to`` NULL while
    current) and ``is_current``; the ``op_col`` is dropped.
    """
    keys = list(keys)
    order = list(order)
    ts_col = order[0]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    versioned = (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return versioned.filter(F.col(op_col) != F.lit(delete_op)).drop(op_col)

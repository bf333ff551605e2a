"""The lake-table seam: the public surface the engine types against.

Everything above the lake layer (pipeline.py, streaming/driver.py, status.py)
drives a table through THIS interface only, so the storage backend is a
drop-in choice:

* :class:`~.snapshot_table.SnapshotTable` (alias ``ParquetSnapshotTable``) —
  the bundled self-contained implementation: parquet data files + JSON
  snapshot commits, no external jars (what this sandbox runs).
* :class:`~.iceberg.IcebergTable` — the Apache Iceberg mapping (SURVEY.md
  §7.2): same contract over a real catalog via ``MERGE INTO``; requires the
  Iceberg runtime jars on the Spark classpath (absent here, so the class
  documents + constructs the SQL but refuses to run — see its docstring).

The contract every implementation must keep (what the engine relies on):

1. ``merge_changes(batch, epoch_id)`` is EXACTLY-ONCE per ``epoch_id``:
   replaying a committed epoch is a structural no-op (``was_noop=True``).
2. Data, schema evolution, the epoch commit log, and lineage become visible
   atomically — a crash mid-merge leaves the table at the previous snapshot.
3. ``read()`` returns the current live state: one winning row per merge key
   under lexicographic ``order``, tombstoned keys hidden.
4. Additive schema evolution: a batch with new columns widens the table
   schema in the same commit; old rows read NULL.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class LakeTable(ABC):
    """Abstract lake table with exactly-once epoch MERGE (see module doc)."""

    # ---- shape -----------------------------------------------------------
    @property
    @abstractmethod
    def schema(self) -> T.StructType:
        """Current (evolved) table schema."""

    @property
    @abstractmethod
    def key(self) -> tuple[str, ...]:
        """MERGE/upsert key columns."""

    @property
    @abstractmethod
    def order(self) -> tuple[str, ...]:
        """Last-writer-wins order columns (compared lexicographically)."""

    @property
    @abstractmethod
    def n_buckets(self) -> int:
        """Hash-bucket count of the storage layout (Iceberg: the bucket(N,…)
        partition transform) — drives write pruning and the pipeline's
        shared bucket-stats pre-pass."""

    # ---- exactly-once ----------------------------------------------------
    @abstractmethod
    def is_epoch_committed(self, epoch_id: int | str) -> bool:
        """True iff ``epoch_id`` was already merged (fast, no scan)."""

    @abstractmethod
    def merge_changes(self, batch: DataFrame, epoch_id: int | str, **kwargs):
        """Idempotent MERGE of an LWW-collapsed change batch; returns
        MergeStats. Must be a no-op for a committed ``epoch_id``."""

    # ---- read ------------------------------------------------------------
    @abstractmethod
    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current live state (tombstones hidden), optionally pruned to a
        subset of storage partitions."""

    @abstractmethod
    def lineage(self) -> DataFrame:
        """Per-epoch per-partition applied/skipped/deleted/max_lsn rows."""

    # ---- maintenance -----------------------------------------------------
    @abstractmethod
    def compact(self, max_files: int = 8) -> int:
        """Bound per-partition file counts (merge-on-read read amplification);
        returns partitions compacted."""

    @abstractmethod
    def vacuum(self, retain_versions: int = 1) -> int:
        """Expire unreferenced files/snapshots; returns files deleted."""

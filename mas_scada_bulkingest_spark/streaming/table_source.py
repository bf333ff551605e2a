"""The lake table as a Structured-Streaming SOURCE — ``spark.readStream
.format("table_changes")`` over a merge-on-read :class:`SnapshotTable`.

The Delta-Lake "streaming from a table" analog (``spark.readStream
.format("delta")``), built on Spark 4's **Python DataSource API**
(`pyspark.sql.datasource`) so downstream pipelines can *tail the lake
table itself* instead of the upstream changelog: the batch surface is
``read_changes`` (CDF); this is its continuous form. Reference parity:
the Java connector only ever re-polls its input directory
(ProcessTagData.java's restart loop) — here the committed table IS the
replayable stream, with Spark's own offset log giving exactly-once.

Design, Spark-first:

* **Offsets are epochs.** ``latestOffset`` reads the table's current
  snapshot JSON (one file read — no Spark job, no data open) and serves
  the highest committed numeric epoch; each micro-batch covers an epoch
  range ``(start, end]``. Epochs are the table's own commit units, so the
  stream's replay story is exactly the table's: a restarted query re-plans
  the same epoch range from the checkpointed offset and gets identical
  rows (delta files are immutable; compaction never removes them from
  retained history; vacuum truncation raises rather than under-serving —
  the same contract ``read_changes`` enforces, via the shared
  :func:`~..lake.snapshot_table._changes_file_map`).
* **One InputPartition per delta file.** Planning is driver-side metadata
  only; executors read their one parquet file via pyarrow and emit Arrow
  RecordBatches (zero per-row Python — the rows never materialize as
  Python objects). Schema evolution and ``rename_column`` aliases resolve
  per file exactly like the JVM read path (missing columns fill typed
  NULLs, former names coalesce newest-first).
* **Rows are the raw CDF feed**: the per-(key, epoch) batch winners with
  ``_change_type`` (``upsert``/``delete`` — deletes carry the tombstone's
  order tuple) and ``_change_epoch``. Typed insert/update/delete
  classification needs a full-history prefix-max (see
  ``read_changes(change_types=True)``) and is not incremental; fold the
  raw feed downstream the way ``replication.sync_replica`` does (winner-
  of-winners per key), or maintain aggregates via ``derived``.

Usage::

    spark.dataSource.register(TableChangesDataSource)
    feed = (spark.readStream.format("table_changes")
            .option("path", table_path)
            .option("sinceEpoch", 0)          # optional, default 0
            .option("maxEpochsPerBatch", 4)   # optional rate limit
            .load())
    q = feed.writeStream.foreachBatch(fold).option("checkpointLocation", c).start()

``maxEpochsPerBatch`` bounds how many NEW epochs each trigger of a live
run admits (steady-tail admission control — the Delta
``maxFilesPerTrigger`` analog, in commit units). The first offset of a
run is uncapped: Spark's Python source API gives a restarted reader no
checkpoint callback, so capping there could move offsets backwards and
double-serve epochs — offset monotonicity wins (see the cursor comment
in the reader). ``availableNow`` therefore drains the whole backlog in
one micro-batch; use a processing-time trigger where admission control
matters.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_FEED_COLS = ("_change_type", "_change_epoch")


def _load_current_snapshot(path: str) -> dict:
    with open(os.path.join(path, "_CURRENT")) as f:
        name = f.read().strip()
    with open(os.path.join(path, "snapshots", name)) as f:
        return json.load(f)


def _plan_columns(snap: dict, schema):
    """(columns, pickled arrow schema, canonical schema json) shared by the
    stream and batch readers — one place for output-column order, rename-
    alias resolution (newest former name first, mirroring ``_alias_read``),
    and the arrow target the executor read casts to."""
    import pickle

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql import types as T

    out = T.StructType([f for f in schema.fields if f.name not in _FEED_COLS])
    aliases = snap.get("column_aliases", {})
    columns = [
        (f.name, list(reversed(aliases.get(f.name, [])))) for f in out.fields
    ]
    return (
        columns,
        pickle.dumps(to_arrow_schema(schema)),
        json.dumps(snap["schema"], sort_keys=True),
    )


def _last_committed_epoch(snap: dict) -> int:
    """Highest committed numeric epoch across namespaces (mirrors
    ``SnapshotTable.last_committed_epoch`` without a table handle; one
    epoch-key grammar — :func:`.._split_epoch_key` — not a reparse)."""
    from ..lake.snapshot_table import _split_epoch_key

    last = -1
    for w in snap.get("epoch_watermarks", {}).values():
        last = max(last, int(w))
    for k in snap.get("committed_epochs", []):
        sp = _split_epoch_key(str(k))
        if sp is not None:
            last = max(last, sp[1])
    return last


@dataclass
class _DeltaFilePartition(InputPartition):
    """One epoch delta file: everything read() needs, fully picklable —
    executors never see the table object."""

    abs_path: str
    epoch: int
    # [(name, alias_names_newest_first)] for every output column in order;
    # feed columns are synthesized, not listed here
    columns: list
    arrow_schema_pickle: bytes


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        # Spark hands options through a case-insensitive map that lowercases
        # keys — normalize so .option("sinceEpoch", …) lands regardless of
        # whether the dict came from Spark or a direct construction
        opts = {k.lower(): v for k, v in options.items()}
        self._path = opts.get("path")
        if not self._path:
            raise ValueError("table_changes source requires .option('path', …)")
        self._since = int(opts.get("sinceepoch", "0"))
        mx = opts.get("maxepochsperbatch")
        self._max_epochs = int(mx) if mx is not None else None
        if self._max_epochs is not None and self._max_epochs < 1:
            # 0 would freeze the offset head forever (planned + 0)
            raise ValueError("maxEpochsPerBatch must be >= 1")
        # validate the table exists / is MoR up front (fail at stream start,
        # not first trigger)
        snap = _load_current_snapshot(self._path)
        if snap.get("mode", "cow") != "mor":
            raise ValueError(
                "table_changes streaming requires a merge-on-read table"
            )
        self._columns, self._arrow_pickle, self._pinned_schema = _plan_columns(
            snap, schema
        )
        # history-walk memo: snapshot history is append-only, so each
        # trigger walks only snapshots committed since the last one (a
        # live stream must not pay O(retained snapshots) of driver JSON
        # parsing per micro-batch)
        self._walk_cache: dict = {}
        # rate-limit cursor: the newest offset this reader has served or
        # announced. None until the run's first offset interaction reveals
        # it — Spark's Python source API has no restart callback and (as of
        # Spark 4.1) calls latestOffset before initialOffset on a fresh
        # availableNow run, so the FIRST latestOffset of any run returns the
        # true head UNCAPPED: capping against a guessed cursor could move
        # offsets BACKWARDS past a restart's checkpoint, and a regressed
        # offset log re-serves epochs (duplicate delivery). Offset
        # monotonicity beats admission control; the cap binds on every
        # trigger after the first (i.e. the steady tail of a live run —
        # availableNow drains the backlog in one batch regardless).
        self._planned: int | None = None

    # ---- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._planned is None:
            self._planned = self._since - 1
        return {"epoch": self._since - 1}

    def latestOffset(self) -> dict:
        last = _last_committed_epoch(_load_current_snapshot(self._path))
        if self._planned is not None:
            if self._max_epochs is not None:
                last = min(last, self._planned + self._max_epochs)
            last = max(last, self._planned)  # never move offsets backwards
        self._planned = last
        return {"epoch": last}

    def partitions(self, start: dict, end: dict):
        from ..lake.snapshot_table import _changes_file_map

        lo, hi = int(start["epoch"]), int(end["epoch"])
        self._planned = max(lo, hi, self._planned if self._planned is not None else -(1 << 62))
        if hi <= lo:
            return [_DeltaFilePartition("", -1, [], b"")]  # empty batch
        snap = _load_current_snapshot(self._path)
        # Schema-change guard (Delta streaming-source parity: fail, never
        # silently drop): the output schema was pinned at stream start; a
        # mid-stream additive evolution would otherwise serve the new
        # column's epochs WITHOUT it, Spark would checkpoint them consumed,
        # and the values would never be re-served. Restart the query to
        # adopt the evolved schema.
        # full-schema comparison (names AND types): additive evolution,
        # renames, drops, and type widening must all trip the guard — a
        # name-only check would let a widened int column reach the
        # executor read as a narrowing arrow cast
        if json.dumps(snap["schema"], sort_keys=True) != self._pinned_schema:
            pinned = [c[0] for c in self._columns]
            current = [f["name"] for f in snap["schema"].get("fields", [])]
            raise RuntimeError(
                f"table schema changed mid-stream (pinned {pinned}, table "
                f"now {current}); restart the streaming query to pick up "
                f"the evolved schema — epochs are not lost (offsets only "
                f"advance on served batches)"
            )
        by_epoch = _changes_file_map(
            self._path, snap, lo + 1, hi, walk_cache=self._walk_cache
        )
        parts = [
            _DeltaFilePartition(f, e, self._columns, self._arrow_pickle)
            for e in sorted(by_epoch)
            for f in by_epoch[e]
        ]
        # a range of committed-but-empty epochs still needs >=1 partition
        return parts or [_DeltaFilePartition("", -1, [], b"")]

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing table-side

    # ---- executor-side read (plain Python + pyarrow, no Spark) -----------
    def read(self, partition: _DeltaFilePartition):
        if partition.epoch < 0:
            return iter(())
        import pickle

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        target = pickle.loads(partition.arrow_schema_pickle)
        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        have = set(tbl.schema.names)
        arrays = []
        for name, olds in partition.columns:
            src = name if name in have else next(
                (o for o in olds if o in have), None
            )
            ftype = target.field(name).type
            if src is None:
                arrays.append(pa.nulls(n, type=ftype))
            else:
                arrays.append(tbl.column(src).cast(ftype))
        # feed columns: delete iff the stored _tombstone flag is set
        if "_tombstone" in have:
            dead = tbl.column("_tombstone").fill_null(False)
            ct = pc.if_else(dead, pa.scalar("delete"), pa.scalar("upsert"))
        else:
            ct = pa.repeat(pa.scalar("upsert"), n)
        arrays.append(ct)
        arrays.append(pa.repeat(pa.scalar(partition.epoch, pa.int64()), n))
        names = [c[0] for c in partition.columns] + list(_FEED_COLS)
        yield pa.RecordBatch.from_arrays(
            [
                a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in arrays
            ],
            names=names,
        )


class TableChangesBatchReader(DataSourceReader):
    """Batch form — ``spark.read.format("table_changes")`` serves one
    epoch range ad hoc (``sinceEpoch``/``toEpoch`` options), planned and
    read exactly like a stream micro-batch. The DataFrame equivalent of
    ``SnapshotTable.read_changes(since, to)`` for consumers that only have
    the format string (SQL connectors, notebooks without the library)."""

    def __init__(self, schema, options):
        opts = {k.lower(): v for k, v in options.items()}
        self._path = opts.get("path")
        if not self._path:
            raise ValueError("table_changes source requires .option('path', …)")
        self._since = int(opts.get("sinceepoch", "0"))
        to = opts.get("toepoch")
        self._to = int(to) if to is not None else None
        self._schema = schema

    def partitions(self):
        from ..lake.snapshot_table import _changes_file_map

        snap = _load_current_snapshot(self._path)
        by_epoch = _changes_file_map(self._path, snap, self._since, self._to)
        columns, arrow, _ = _plan_columns(snap, self._schema)
        parts = [
            _DeltaFilePartition(f, e, columns, arrow)
            for e in sorted(by_epoch)
            for f in by_epoch[e]
        ]
        return parts or [_DeltaFilePartition("", -1, [], b"")]

    # identical executor-side file read as the stream reader
    read = TableChangesStreamReader.read


class TableChangesDataSource(DataSource):
    """``format("table_changes")`` — register once per session with
    ``spark.dataSource.register(TableChangesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self):
        from pyspark.sql import types as T

        snap = _load_current_snapshot(self.options["path"])
        base = T.StructType.fromJson(snap["schema"])
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_change_epoch", T.LongType()),
            ]
        )

    def reader(self, schema) -> TableChangesBatchReader:
        return TableChangesBatchReader(schema, dict(self.options))

    def streamReader(self, schema) -> TableChangesStreamReader:
        return TableChangesStreamReader(schema, dict(self.options))

"""Streaming & replay drivers.

``run_stream`` is the Structured Streaming re-expression of the reference's
polling loop (ProcessTagData.java:47-65 + DBConnector.java:89-256): a file
source tails the change-log directory in micro-batches; ``foreachBatch``
applies each batch through the exactly-once MERGE; the streaming checkpoint
replaces the offset JSON (OffsetRecord.java:217-302). Because the sink is
additionally guarded by the epoch commit log *inside the table snapshot*, a
restart that re-delivers a batch (checkpoint lag) is still a no-op — stronger
than the reference, which re-inserts on crash between upload and checkpoint
(SURVEY.md §3.1).

``replay_batches`` is the bounded/batch analog (the reference's catch-up
mode, OffsetRecord.java:250-279): it walks the change-log files in lsn order
in epoch-sized groups, reading each epoch with its *own* merged file schema so
mid-stream additive schema evolution is exercised without a stream restart.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..lake.base import LakeTable
from ..lake.snapshot_table import MergeStats, SnapshotTable
from ..pipeline import apply_changes
from ..schemas import CHANGE_SCHEMA_EVOLVED


def build_session(
    app_name: str = "mas-scada-bulkingest-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Opinionated session: AQE on (coalesce + skew join), Arrow on.

    ``cores`` sets ``local[N]`` when no master is given — this is how the
    N-vs-4N scaling evidence is produced in the sandbox (BASELINE.md).
    """
    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores or 32))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


#: above this many files per epoch, schema union falls back to Spark's
#: distributed mergeSchema job (driver-side footer reads would serialize)
_FOOTER_UNION_MAX_FILES = 256


def _read_epoch_group(spark: SparkSession, group: list[str]):
    """Read one epoch's file group with a merged (additive-evolution) schema.

    For bounded groups the schema union happens DRIVER-SIDE from the parquet
    footers (pyarrow): Spark's ``mergeSchema=true`` spawns a whole
    distributed job (one task per file) just to union schemas — measured
    ~0.7 s + a scheduling barrier per epoch at 64 files, pure overhead when
    the driver can read 64 footers from the same store in milliseconds.
    Groups larger than ``_FOOTER_UNION_MAX_FILES`` (or any footer-read
    failure) fall back to the distributed path — at cluster scale with
    thousands of files per epoch the distributed union IS the right tool.
    """
    if len(group) <= _FOOTER_UNION_MAX_FILES:
        try:
            import pyarrow.parquet as _pq

            from pyspark.sql.pandas.types import from_arrow_schema

            from ..operators.schema_evolution import merge_schemas

            merged: T.StructType | None = None
            for f in group:
                s = from_arrow_schema(
                    _pq.read_schema(f), prefer_timestamp_ntz=True
                )
                merged = s if merged is None else merge_schemas(merged, s)
            return spark.read.schema(merged).parquet(*group)
        except Exception:
            pass  # unreadable footer / unmappable type: distributed union
    return spark.read.option("mergeSchema", "true").parquet(*group)


def replay_batches(
    spark: SparkSession,
    changes_dir: str,
    table: LakeTable,
    files_per_epoch: int = 1,
    files_per_epoch_tail: int | None = None,
    start_epoch: int = 0,
    on_epoch: Callable[[MergeStats], None] | None = None,
    **apply_kwargs,
) -> list[MergeStats]:
    """Batch replay of a change-log directory in epoch-sized file groups.

    Each epoch's files are read with ``mergeSchema`` over just that group, so
    the engine sees the ``metadata`` column appear exactly when the stream
    evolved — additive evolution flows through ``merge_changes`` which ALTERs
    the table schema in the same atomic snapshot commit.

    ``files_per_epoch_tail`` enables the reference's adaptive cadence
    (OffsetRecord.java:250-279: 14 400 s windows while catching up, ≤120 s at
    the tail): epochs consume ``files_per_epoch`` files while the remaining
    backlog exceeds one catch-up window, then shrink to
    ``files_per_epoch_tail`` so tail latency (and per-epoch commit size)
    drops once caught up.
    """
    files = sorted(
        os.path.join(changes_dir, f)
        for f in os.listdir(changes_dir)
        if f.endswith(".parquet")
    )
    groups: list[list[str]] = []
    i = 0
    while i < len(files):
        size = files_per_epoch
        if files_per_epoch_tail is not None and len(files) - i <= files_per_epoch:
            size = files_per_epoch_tail  # caught up: shrink the window
        groups.append(files[i : i + size])
        i += size
    stats: list[MergeStats] = []
    for e, group in enumerate(groups):
        batch = _read_epoch_group(spark, group)
        st = apply_changes(table, batch, epoch_id=start_epoch + e, **apply_kwargs)
        stats.append(st)
        if on_epoch:
            on_epoch(st)
    return stats


def _apply_staged(table, batch_df, epoch_key, wap_audit, apply_kwargs) -> None:
    """One micro-batch through write-audit-publish (see :func:`run_stream`).

    Replay safety across the stage/publish split: a crash after staging but
    before publish leaves the epoch uncommitted and a staged ref on disk;
    the checkpoint replays the batch, and instead of staging a duplicate we
    find the existing ref for THIS epoch and resume at the audit. A crash
    after publish replays into ``is_epoch_committed`` → no-op.
    """
    if table.is_epoch_committed(epoch_key):
        return
    ref = None
    for r in table.staged_refs():
        if table._load_staged(r).get("staged_epoch") == str(epoch_key):
            ref = r  # resume a crashed stage→publish at the audit step
            break
    if ref is None:
        kwargs = {
            k: v
            for k, v in apply_kwargs.items()
            if k not in ("auto_compact_files", "auto_cluster_files")
        }
        stats = apply_changes(table, batch_df, epoch_key, stage=True, **kwargs)
        if stats.was_noop:  # committed by a concurrent replay meanwhile
            return
        ref = stats.staged_ref
    else:
        staged = table._load_staged(ref)
        a, sk, dl = staged.get("staged_counts", [0, 0, 0])
        from ..lake.snapshot_table import MergeStats

        stats = MergeStats(epoch_key, a, sk, dl, staged.get("staged_max_lsn"),
                           was_noop=False, staged_ref=ref)
    if not wap_audit(table.read_staged(ref), stats):
        table.abort_staged(ref)
        raise RuntimeError(
            f"WAP audit rejected epoch {epoch_key!r}: staged data discarded, "
            f"epoch stays replayable after the upstream is fixed"
        )
    table.publish_staged(ref)


def run_stream(
    spark: SparkSession,
    changes_dir: str,
    table_path: str | None,
    checkpoint_dir: str,
    schema: T.StructType = CHANGE_SCHEMA_EVOLVED,
    max_files_per_trigger: int | None = 4,
    available_now: bool = True,
    source_format: str = "parquet",
    transform: Callable | None = None,
    prepare_batch: Callable | None = None,
    sink: Callable | None = None,
    rollup_path: str | None = None,
    derived_tables: list | None = None,
    wap_audit: Callable | None = None,
    **apply_kwargs,
):
    """Structured-Streaming tail of the change-log directory.

    The file-source schema is pinned (a stream cannot change schema mid-run —
    on additive evolution, restart the stream with the widened schema; the
    epoch guard makes the overlap replay safe). ``max_files_per_trigger``
    mirrors the reference's bounded extraction window (``fetchInterval``
    pacing, Config.java:74-75). ``available_now=True`` drains the backlog and
    stops — the reference's catch-up mode; pass ``False`` for a continuous
    tail.

    ``source_format``: ``"parquet"`` (default, change-schema files) or
    ``"text"`` (one raw record per line — the on-disk analog of a Kafka
    ``value`` column, schema ``value: string``). ``transform`` is applied to
    the STREAMING DataFrame before the foreachBatch sink (pure column
    expressions only — e.g. :func:`~..sources.debezium.parse_debezium`), so
    wire-format decoding runs inside each micro-batch plan, not per-batch
    Python. ``prepare_batch(batch_df, epoch_key) -> batch_df`` runs INSIDE
    foreachBatch before the merge — the seam for per-batch side channels
    (dead-letter routing, reject metrics); anything it writes is
    at-least-once under replay (the merge itself stays exactly-once).
    ``sink(batch_df, epoch_key)`` replaces the default single-table
    ``apply_changes`` entirely (``table_path`` may then be None) — the seam
    :func:`run_stream_routed` uses for multi-table fan-out; the sink owns
    its own exactly-once guarantees (per-table epoch commit logs).

    ``rollup_path`` cascades the per-conversation derived rollup INSIDE the
    micro-batch loop (``derived.refresh_rollup`` after each merge), so the
    derived table is fresh to within one micro-batch. Crash-safe by the
    cursor design: the refresh commits under the source's latest epoch id,
    so a crash between merge and refresh just widens the next refresh's
    range, and a replayed batch no-ops both merges. Requires the default
    single-table sink on a merge-on-read table.

    ``derived_tables`` generalizes the cascade to ANY per-key aggregates:
    a list of ``(derived_SnapshotTable, aggregate)`` pairs (the caller
    creates the tables — e.g. ``create_dedup_index`` + ``lsh_index_state``
    to keep a near-dup LSH index fresh to within one micro-batch alongside
    the rollup), each refreshed through ``derived.refresh_derived`` after
    every merge with the same crash-safe cursor and the same
    rebuild-on-truncated-feed fallback as ``rollup_path``.

    ``wap_audit(staged_table, stats) -> bool`` gates every micro-batch
    through write-audit-publish: the merge is STAGED (invisible), the
    callback audits the staged state through the normal read path
    (``staged_table.read()``, lookups, count probes — exactly what publish
    would make visible), and a truthy return publishes atomically while a
    falsy return aborts the stage and FAILS the stream (bad data needs an
    operator; the epoch stays replayable once the upstream is fixed).
    Crash-safe across the stage/publish split: a batch replayed after a
    crash finds its already-staged epoch and re-audits/publishes it instead
    of staging a duplicate. This is the DLT-expectations idea moved to the
    commit boundary — nothing, not even a millisecond of visibility,
    precedes the audit. Requires the default single-table sink.
    """
    table = None if sink is not None else SnapshotTable(spark, table_path)
    cascades: list[tuple] = []
    if rollup_path is not None or derived_tables:
        if table is None:
            raise ValueError(
                "rollup_path/derived_tables require the default single-table sink"
            )
        if getattr(table, "mode", None) != "mor":
            raise ValueError(
                "rollup_path/derived_tables require a merge-on-read table "
                "(the refresh reads the changes feed); use "
                "derived.rebuild_derived for CoW"
            )
        from ..derived import create_conversation_rollup, rollup_state

        if rollup_path is not None:
            cascades.append(
                (create_conversation_rollup(spark, rollup_path), rollup_state)
            )
        cascades.extend(derived_tables or [])
    # Namespace epoch ids by checkpoint lineage: the same checkpoint replays
    # the same batch ids (-> no-ops), while a NEW checkpoint must not collide
    # with previously committed ids (its batch ids restart at 0). Re-applied
    # overlap is then resolved by cross-epoch LWW instead of being dropped.
    ns = hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]

    def _apply(batch_df, batch_id: int) -> None:
        epoch_key = f"{ns}:{batch_id}"
        if prepare_batch is not None:
            batch_df = prepare_batch(batch_df, epoch_key)
        if sink is not None:
            sink(batch_df, epoch_key)
        else:
            if wap_audit is not None:
                _apply_staged(table, batch_df, epoch_key, wap_audit, apply_kwargs)
            else:
                apply_changes(table, batch_df, epoch_key, **apply_kwargs)
            if cascades:
                from ..derived import rebuild_derived, refresh_derived

                for dt, agg in cascades:
                    try:
                        refresh_derived(table, dt, agg)
                    except FileNotFoundError:
                        # feed cannot serve the pending state (bootstrap
                        # load, vacuumed range): absorb once via full
                        # rebuild, which also catches the cursor up so
                        # later batches refresh incrementally. ValueError
                        # (source restored backwards) propagates and fails
                        # the stream loudly.
                        rebuild_derived(table, dt, agg)

    rs = spark.readStream.option(
        "maxFilesPerTrigger", max_files_per_trigger or 1000000
    )
    if source_format == "parquet":
        reader = rs.schema(schema).parquet(changes_dir)
    elif source_format == "text":
        reader = rs.text(changes_dir)
    else:
        raise ValueError(f"unsupported source_format {source_format!r}")
    if transform is not None:
        reader = transform(reader)
    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q


def run_stream_routed(
    spark: SparkSession,
    changes_dir: str,
    routes: dict,
    checkpoint_dir: str,
    patterns: list[tuple[str, str]],
    discard: list[str] | None = None,
    default_route: str | None = None,
    auto_compact_files: int | None = None,
    **kwargs,
):
    """Streaming fan-out: tail the change log and route every micro-batch
    into several destination tables (``routes``: name →
    :class:`~..lake.base.LakeTable`) via
    :func:`~..pipeline.route_changes` — one classification pass per batch,
    per-table exactly-once under the checkpoint-namespaced epoch id. A crash
    between route commits replays the batch on restart; committed routes
    no-op and the rest apply (the streaming form of the reference's
    monthly-table routing, MonitorTable.java:122-150)."""
    from ..pipeline import route_changes

    def sink(batch_df, epoch_key: str) -> None:
        route_changes(
            routes,
            batch_df,
            epoch_key,
            patterns=patterns,
            discard=discard,
            default_route=default_route,
            auto_compact_files=auto_compact_files,
        )

    return run_stream(
        spark, changes_dir, None, checkpoint_dir, sink=sink, **kwargs
    )


def run_stream_debezium(
    spark: SparkSession,
    envelopes_dir: str,
    table_path: str,
    checkpoint_dir: str,
    payload_schema: T.StructType,
    key_cols=("conv_id", "turn_idx"),
    on_malformed: str = "drop",
    dlq_dir: str | None = None,
    **kwargs,
):
    """Tail a directory of Debezium JSON-envelope files (one envelope per
    line — the file-source stand-in for a Kafka topic's ``value`` column)
    into the exactly-once MERGE sink: ``readStream.text`` →
    :func:`~..sources.debezium.parse_debezium` (pure ``from_json`` column
    exprs inside the micro-batch plan) → ``foreachBatch`` ``apply_changes``.
    Same checkpoint/epoch-namespace/exactly-once semantics as
    :func:`run_stream`.

    ``dlq_dir``: dead-letter queue — malformed envelopes (unparseable JSON,
    unknown op, NULL key) are appended there as parquet rows
    ``(envelope, epoch_key)`` with the ORIGINAL wire bytes for forensics,
    instead of being silently dropped. DLQ appends are at-least-once under
    crash-replay (dedup downstream on envelope text if needed); the merge
    itself stays exactly-once.
    """
    import pyspark.sql.functions as F

    from ..sources.debezium import malformed_predicate, parse_debezium

    if dlq_dir is None:
        transform = lambda df: parse_debezium(  # noqa: E731
            df, "value", payload_schema, key_cols=key_cols,
            on_malformed=on_malformed,
        )
        prepare = None
    else:
        transform = lambda df: parse_debezium(  # noqa: E731
            df, "value", payload_schema, key_cols=key_cols,
            on_malformed="keep", keep_raw=True,
        )
        bad = malformed_predicate(key_cols)

        def prepare(batch_df, epoch_key: str):
            (
                batch_df.filter(bad)
                .select(
                    F.col("_raw_envelope").alias("envelope"),
                    F.lit(epoch_key).alias("epoch_key"),
                )
                .write.mode("append")
                .parquet(dlq_dir)
            )
            return batch_df.filter(~bad).drop("_raw_envelope")

    return run_stream(
        spark,
        envelopes_dir,
        table_path,
        checkpoint_dir,
        source_format="text",
        transform=transform,
        prepare_batch=prepare,
        **kwargs,
    )


def run_stream_adaptive(
    spark: SparkSession,
    changes_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: T.StructType = CHANGE_SCHEMA_EVOLVED,
    catchup_files_per_trigger: int = 64,
    tail_files_per_trigger: int = 1,
    tail_available_now: bool = False,
    **apply_kwargs,
):
    """Adaptive micro-batch cadence ON the streaming path (reference
    OffsetRecord.java:250-279: 14 400 s extraction windows while catching up,
    ≤120 s once at the tail).

    Phase 1 drains the entire backlog with ``availableNow`` and a LARGE
    ``maxFilesPerTrigger`` (few big epochs — fixed per-epoch commit cost is
    amortized over many files while behind). When the drain terminates, the
    tail phase restarts the stream UNDER THE SAME CHECKPOINT with a small
    trigger (low-latency small epochs). The seam is safe by construction:
    the checkpoint carries the file-source offsets forward, batch ids keep
    incrementing within the same namespace, and even a re-delivered overlap
    batch is a no-op via the epoch commit log (exactly-once preserved across
    the switch — regression-tested in tests/test_adaptive_stream.py).

    Returns the running tail query (pass ``tail_available_now=True`` to also
    drain-and-stop the tail, e.g. in tests).
    """
    q1 = run_stream(
        spark,
        changes_dir,
        table_path,
        checkpoint_dir,
        schema=schema,
        max_files_per_trigger=catchup_files_per_trigger,
        available_now=True,
        **apply_kwargs,
    )
    q1.awaitTermination()
    return run_stream(
        spark,
        changes_dir,
        table_path,
        checkpoint_dir,
        schema=schema,
        max_files_per_trigger=tail_files_per_trigger,
        available_now=tail_available_now,
        **apply_kwargs,
    )


def await_or_stop(
    query,
    stop_file: str | None = None,
    poll_secs: float = 2.0,
    timeout_secs: float | None = None,
    stop_check=None,
) -> bool:
    """Await a streaming query with stop escape hatches (SURVEY.md T4).

    The reference polls a remote stopFlag every 60 s and watches a ``.update``
    file to trigger graceful shutdown (DBConnector.java:108-123;
    Config.java:251-257). Here: if ``stop_file`` appears on disk — or the
    ``stop_check()`` callable returns truthy (the REMOTE stop-flag analog:
    poll an HTTP endpoint, a control table, the status server's stop flag,
    …) — the query is stopped after its in-flight batch commits; the epoch
    guard makes the cut clean (resume re-delivers at most one
    already-committed batch, a no-op).

    Returns True if the query terminated on its own, False if stopped via a
    stop signal or timeout.
    """
    import time as _time

    deadline = (_time.monotonic() + timeout_secs) if timeout_secs else None
    while True:
        if query.awaitTermination(poll_secs):
            return True
        if (stop_file and os.path.exists(stop_file)) or (
            stop_check is not None and stop_check()
        ):
            query.stop()
            query.awaitTermination()
            return False
        if deadline and _time.monotonic() > deadline:
            query.stop()
            query.awaitTermination()
            return False


def supervise(
    start_query,
    backoff_secs: float = 30.0,
    max_restarts: int | None = None,
    stop_file: str | None = None,
    stop_check=None,
    poll_secs: float = 2.0,
    on_restart=None,
    sleep=None,
) -> dict:
    """Crash-restart supervisor around a streaming query (SURVEY.md T4).

    The reference wraps its whole extract loop in a catch-all restart loop
    with a fixed 30 s backoff (ProcessTagData.java:47-65: log, sleep, retry
    forever). Here ``start_query`` is a zero-arg factory that (re)starts the
    stream FROM ITS CHECKPOINT — a relaunch after a crash re-delivers at
    most the in-flight batch, which the epoch commit log turns into a no-op,
    so supervision never breaks exactly-once (the property a 24/7 deployment
    actually needs from this wrapper).

    Stops when: the query terminates cleanly (drain/availableNow), a stop
    signal fires (``stop_file`` on disk / ``stop_check()`` truthy — same
    contract as :func:`await_or_stop`), or ``max_restarts`` relaunches were
    already consumed (then the last failure re-raises: a permanently
    poisoned stream must fail loudly, not flap forever silently).
    ``on_restart(attempt, exc)`` is the observability hook (log/alert).
    Backoff sleeps are interrupted early by a stop signal.

    Returns ``{"restarts": n, "clean": bool, "stopped": bool}``.
    """
    import time as _time

    sleep = sleep or _time.sleep
    restarts = 0

    def _stop_signalled() -> bool:
        return bool(
            (stop_file and os.path.exists(stop_file))
            or (stop_check is not None and stop_check())
        )

    while True:
        query = start_query()
        try:
            clean = await_or_stop(
                query, stop_file=stop_file, poll_secs=poll_secs,
                stop_check=stop_check,
            )
            return {"restarts": restarts, "clean": clean, "stopped": not clean}
        except Exception as exc:  # query died (StreamingQueryException et al.)
            if max_restarts is not None and restarts >= max_restarts:
                raise
            restarts += 1
            if on_restart is not None:
                on_restart(restarts, exc)
            # interruptible backoff: a stop request during the sleep wins
            waited = 0.0
            step = min(poll_secs, backoff_secs) or backoff_secs
            while waited < backoff_secs:
                if _stop_signalled():
                    return {"restarts": restarts, "clean": False, "stopped": True}
                sleep(min(step, backoff_secs - waited))
                waited += step
            if _stop_signalled():
                return {"restarts": restarts, "clean": False, "stopped": True}

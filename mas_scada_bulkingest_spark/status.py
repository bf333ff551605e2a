"""Operational status over the lineage table.

The Spark re-expression of the reference's stats surface — the HTTP
``/masdcStats`` page (StatsServer.java:64-83), the TCP CLI ``getStats``
(CLIServer.java:34-48) and the 60 s heartbeat stats row
(ConnectorStats.java:59-83) — as plain queryable functions over the
``_lineage`` table, plus :func:`serve_status`, a minimal HTTP endpoint so a
24/7 stream deployment has a scrape target and a remote stop flag.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lake.snapshot_table import SnapshotTable


def epoch_summary(table: SnapshotTable) -> DataFrame:
    """One row per epoch: totals + throughput inputs (applied/skipped/deleted,
    max LSN watermark, partitions touched)."""
    rows = F.col("applied") + F.col("skipped") + F.col("deleted")
    return (
        table.lineage()
        # epoch_key disambiguates equal batch numbers from different
        # checkpoint lineages (epoch_id alone would conflate them)
        .groupBy(F.coalesce("epoch_key", F.col("epoch_id").cast("string")).alias("epoch_key"))
        .agg(
            F.max("epoch_id").alias("epoch_id"),
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("applied").alias("applied"),
            F.sum("skipped").alias("skipped"),
            F.sum("deleted").alias("deleted"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("wall_secs").alias("wall_secs"),
            # NULL (not a divide-by-zero or a NULL-poisoned rate) for lineage
            # rows written before wall_secs existed, and for sub-millisecond
            # merges whose wall rounds to 0.0.
            F.when(
                F.max("wall_secs") > 0,
                F.sum(rows).cast("double") / F.max("wall_secs"),
            ).alias("rows_per_sec"),
            F.max("committed_ts").alias("committed_ts"),
        )
        # numeric epoch order within a lineage (the string epoch_key alone
        # would sort '10' before '2'), key as tiebreak across lineages
        .orderBy(F.col("epoch_id"), F.col("epoch_key"))
    )


def status(table: SnapshotTable) -> dict:
    """Driver-side snapshot of connector health (the ``getStats`` analog).

    Returns totals across all committed epochs plus table-shape facts from
    the current snapshot (no full-table scan).
    """
    per_epoch = epoch_summary(table)
    lin = per_epoch.agg(
        F.count(F.lit(1)).alias("epochs"),
        F.sum("applied").alias("applied"),
        F.sum("skipped").alias("skipped"),
        F.sum("deleted").alias("deleted"),
        F.max("max_lsn").alias("max_lsn"),
        F.sum("wall_secs").alias("merge_secs"),
        F.max("committed_ts").alias("last_commit_ts"),
    ).first()
    snap = table._snapshot
    # expectations event log: per-constraint violation totals across all
    # committed epochs (empty dict when the table never had constraints;
    # one small driver-side aggregate over the deduped metrics files)
    violations = {
        r["constraint_name"]: {"mode": r["mode"], "total": int(r["total"])}
        for r in table.constraint_metrics()
        .groupBy("constraint_name", "mode")
        .agg(F.sum("violations").alias("total"))
        .collect()
    }
    n_files = sum(len(v) for v in snap["buckets"].values())
    total_rows = int(lin["applied"] or 0) + int(lin["skipped"] or 0) + int(
        lin["deleted"] or 0
    )
    merge_secs = float(lin["merge_secs"]) if lin["merge_secs"] else None
    return {
        # arithmetic count from the folded (watermark + extras) form — the
        # expanding committed_epochs property is O(total epochs) per call
        "epochs_committed": table.committed_epoch_count,
        "epochs_with_lineage": int(lin["epochs"] or 0),
        "rows_applied": int(lin["applied"] or 0),
        "rows_skipped": int(lin["skipped"] or 0),
        "rows_deleted": int(lin["deleted"] or 0),
        # the reference's per-cycle rate (rowCount*1000/cycleMillis,
        # DBConnector.java:235-238), here queryable over all epochs
        "merge_secs": merge_secs,
        "rows_per_sec": (
            round(total_rows / merge_secs, 1) if merge_secs else None
        ),
        "max_lsn": int(lin["max_lsn"]) if lin["max_lsn"] is not None else None,
        "last_commit_ts": str(lin["last_commit_ts"]) if lin["last_commit_ts"] else None,
        "snapshot_version": snap["version"],
        # wall-clock commit stamp of the current snapshot (TIMESTAMP AS OF
        # anchor; None on pre-stamp snapshots)
        "snapshot_committed_at": snap.get("committed_at"),
        "n_buckets": snap["n_buckets"],
        "n_data_files": n_files,
        # manifest-level layout totals (zero file opens — the same numbers
        # files()/partitions() serve): bytes on disk, and the STORED row
        # count (base + not-yet-compacted delta versions + tombstones, so
        # >= the live-row count a read() returns; None before the
        # record-count stamp existed)
        "live_bytes": sum(snap.get("file_sizes", {}).values()),
        "stored_records": (
            None
            if any(
                snap.get("file_rows", {}).get(f) is None
                for fs in snap["buckets"].values()
                for f in fs
            )
            else sum(
                snap["file_rows"][f]
                for fs in snap["buckets"].values()
                for f in fs
            )
        ),
        "schema_fields": [f.name for f in table.schema.fields],
        "constraint_violations": violations,
    }


#: status() fields exported on /metrics, with Prometheus type + help text.
#: Only numeric fields appear; counters are cumulative over committed epochs.
_PROM_FIELDS = [
    ("epochs_committed", "counter", "Epochs sealed in the snapshot commit log"),
    ("epochs_with_lineage", "counter", "Epochs with lineage rows"),
    ("rows_applied", "counter", "Change rows applied across all epochs"),
    ("rows_skipped", "counter", "Stale change rows skipped (lost LWW)"),
    ("rows_deleted", "counter", "Delete rows applied (tombstoned)"),
    ("merge_secs", "counter", "Cumulative merge wall seconds"),
    ("rows_per_sec", "gauge", "Rows per merge-second over all epochs"),
    ("max_lsn", "gauge", "Highest LSN applied (resume watermark)"),
    ("snapshot_version", "gauge", "Current snapshot version"),
    ("n_buckets", "gauge", "Bucket count (hash layout)"),
    ("n_data_files", "gauge", "Live data files in the current snapshot"),
    ("live_bytes", "gauge", "Bytes across live data files (manifest sizes)"),
    ("stored_records", "gauge", "Stored rows incl. superseded delta versions"),
]


def render_prometheus(st: dict, prefix: str = "cdc_ingest") -> str:
    """:func:`status` dict → Prometheus text exposition format (0.0.4).

    Pure function so it is testable without a server; ``serve_status``
    exposes it at ``GET /metrics``. The reference publishes its stats as
    ad-hoc JSON (StatsServer.java:64-83); a fleet of 1000 ingest drivers
    needs the scrape format every monitoring stack already speaks.
    """
    lines = []
    for field, kind, help_txt in _PROM_FIELDS:
        v = st.get(field)
        if v is None:
            continue
        name = f"{prefix}_{field}"
        lines.append(f"# HELP {name} {help_txt}")
        lines.append(f"# TYPE {name} {kind}")
        lines.append(f"{name} {float(v):g}")
    # per-constraint violation counters, labeled (the DLT expectations
    # metrics surface — one series per constraint)
    viol = st.get("constraint_violations") or {}
    if viol:
        name = f"{prefix}_constraint_violations_total"
        lines.append(
            f"# HELP {name} CHECK-constraint violations across committed epochs"
        )
        lines.append(f"# TYPE {name} counter")
        for cname in sorted(viol):
            v = viol[cname]
            lines.append(
                f'{name}{{constraint="{cname}",mode="{v["mode"]}"}} '
                f'{float(v["total"]):g}'
            )
    return "\n".join(lines) + "\n"


def serve_status(
    table: SnapshotTable, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Serve the status surface over HTTP from a daemon thread — the live
    operational endpoint the reference runs as StatsServer (``/masdcStats``,
    StatsServer.java:64-83) plus its remotely pollable stop flag
    (DBConnector.java:108-116):

    * ``GET /status`` → :func:`status` as JSON
    * ``GET /epochs`` → :func:`epoch_summary` rows as a JSON array
    * ``GET /files`` / ``GET /partitions`` → the metadata inspection
      tables (``SnapshotTable.files``/``partitions``) as JSON arrays —
      the layout/skew dashboard, manifest-only (no data scan)
    * ``GET /metrics`` → :func:`render_prometheus` text exposition (the
      same numbers as ``/status``, scrapeable by Prometheus/Grafana)
    * ``POST /loglevel?level=DEBUG`` → flips the Spark log level live
      (the reference CLIServer's setDebug/unsetDebug, CLIServer.java:50-60)
    * ``POST /stop``  → sets the server's ``stop_event``; pass
      ``stop_check=server.stop_event.is_set`` to
      :func:`~mas_scada_bulkingest_spark.streaming.driver.await_or_stop` for
      a remotely triggered graceful shutdown (the in-flight epoch commits,
      then the stream stops)

    ``port=0`` binds an ephemeral port (read ``server.server_port``). The
    handlers run Spark driver actions, so serve one table per process and
    expect scrape latency ∝ lineage size, not table size (no data scan).
    Call ``server.shutdown()`` to stop serving.
    """
    stop_event = threading.Event()

    class _Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path == "/status":
                    self._send(200, status(table))
                elif self.path == "/epochs":
                    self._send(
                        200, [r.asDict() for r in epoch_summary(table).collect()]
                    )
                elif self.path == "/files":
                    self._send(
                        200, [r.asDict() for r in table.files().collect()]
                    )
                elif self.path == "/partitions":
                    self._send(
                        200,
                        [r.asDict() for r in table.partitions().collect()],
                    )
                elif self.path == "/metrics":
                    body = render_prometheus(status(table)).encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send(
                        404,
                        {"error": "not found", "endpoints": ["/status", "/epochs", "/files", "/partitions", "/metrics", "POST /stop", "POST /loglevel"]},
                    )
            except Exception as e:  # surface, don't kill the server thread
                self._send(500, {"error": str(e)})

        def do_POST(self):
            if self.path == "/stop":
                stop_event.set()
                self._send(200, {"stopping": True})
            elif self.path.startswith("/loglevel"):
                # runtime log-level toggle — the reference's CLIServer
                # setDebug/unsetDebug commands (CLIServer.java:50-60,79-82)
                # as an HTTP verb: POST /loglevel?level=DEBUG (or a JSON
                # body {"level": "DEBUG"}). Applies live via
                # SparkContext.setLogLevel; no restart, no new config.
                level = None
                if "?" in self.path:
                    from urllib.parse import parse_qs, urlsplit

                    level = parse_qs(urlsplit(self.path).query).get(
                        "level", [None]
                    )[0]
                if level is None:
                    n = int(self.headers.get("Content-Length") or 0)
                    if n:
                        try:
                            level = json.loads(self.rfile.read(n)).get("level")
                        except Exception:
                            level = None
                valid = {"ALL", "DEBUG", "ERROR", "FATAL", "INFO", "OFF",
                         "TRACE", "WARN"}
                if not level or level.upper() not in valid:
                    self._send(
                        400,
                        {"error": "pass ?level= or body {'level': ...}",
                         "valid": sorted(valid)},
                    )
                    return
                try:
                    table.spark.sparkContext.setLogLevel(level.upper())
                    server.log_level = level.upper()
                    self._send(200, {"log_level": level.upper()})
                except Exception as e:
                    self._send(500, {"error": str(e)})
            else:
                self._send(404, {"error": "not found"})

        def log_message(self, *args):  # keep the driver log clean
            pass

    server = ThreadingHTTPServer((host, port), _Handler)
    server.stop_event = stop_event
    server.log_level = None
    threading.Thread(
        target=server.serve_forever, daemon=True, name="status-http"
    ).start()
    return server

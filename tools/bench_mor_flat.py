"""Evidence that merge-on-read epoch cost is O(batch), not O(table).

Applies a sequence of equal-size epochs to a fresh table in each mode and
records per-epoch merge wall seconds. Copy-on-write rewrites every affected
bucket, so with uniform hash bucketing its per-epoch cost grows with table
size; merge-on-read appends per-bucket deltas (with periodic compaction), so
its per-epoch cost must stay ~flat. Prints one JSON line consumed by BENCH.md.

Usage: python tools/bench_mor_flat.py [n_epochs] [events_per_epoch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.streaming.driver import build_session


def _workdir(prefix: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def _epoch_file(path: str, epoch: int, n: int, n_convs: int) -> None:
    """One epoch of inserts into a FRESH conversation range per epoch, so
    the table grows linearly while every epoch's batch stays the same size
    and (by uniform hashing) touches every bucket — the exact workload where
    copy-on-write's rewrite cost grows with the table and merge-on-read's
    append cost must not."""
    rng = np.random.default_rng(1000 + epoch)
    lsn = np.arange(epoch * n + 1, epoch * n + n + 1, dtype=np.int64)
    conv = epoch * n_convs + rng.integers(0, n_convs, size=n)
    turn = rng.integers(0, 8, size=n).astype(np.int32)
    ts = (1704067200 + lsn * 2).astype("datetime64[s]").astype("datetime64[us]")
    tbl = pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array(np.full(n, "update"), pa.string()),
            "conv_id": pa.array(
                np.char.add("conv-", conv.astype(np.int64).astype(str)), pa.string()
            ),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(np.full(n, "user"), pa.string()),
            "text": pa.array(np.char.add("t", lsn.astype(str)), pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, path)


def run_mode(spark, mode: str, n_epochs: int, per_epoch: int, n_convs: int) -> dict:
    work = _workdir(f"morflat_{mode}_")
    table = create_transcripts_table(
        spark, os.path.join(work, "t"), n_buckets=32, mode=mode
    )
    secs, write_secs, compact_secs = [], [], []
    for e in range(n_epochs):
        f = os.path.join(work, f"ep{e}.parquet")
        _epoch_file(f, e, per_epoch, n_convs)
        batch = spark.read.parquet(f)
        t0 = time.perf_counter()
        st = apply_changes(
            table, batch, epoch_id=e,
            auto_compact_files=8 if mode == "mor" else None,
        )
        secs.append(round(time.perf_counter() - t0, 3))
        write_secs.append((st.timings or {}).get("write", 0.0))
        compact_secs.append((st.timings or {}).get("compact", 0.0))
    head = sum(secs[1:4]) / 3  # skip epoch 0 (JVM/plan warm-up)
    tail = sum(secs[-3:]) / 3
    # the data-dependent phase: CoW's write rewrites every affected bucket
    # (grows with the table); MoR's writes only the batch delta (flat).
    whead = sum(write_secs[1:4]) / 3
    wtail = sum(write_secs[-3:]) / 3
    return {
        "per_epoch_secs": secs,
        "write_phase_secs": write_secs,
        "compact_phase_secs": compact_secs,
        "head_mean_s": round(head, 3),
        "tail_mean_s": round(tail, 3),
        "tail_over_head": round(tail / head, 2),
        "write_head_mean_s": round(whead, 3),
        "write_tail_mean_s": round(wtail, 3),
        "write_tail_over_head": round(wtail / max(whead, 1e-9), 2),
    }


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_convs = 40_000
    spark = build_session(
        cores=8, shuffle_partitions=8,
        extra_conf={"spark.local.dir": _workdir("morflat_local_")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "n_epochs": n_epochs,
        "events_per_epoch": per_epoch,
        "new_convs_per_epoch": n_convs,
        "cow": run_mode(spark, "cow", n_epochs, per_epoch, n_convs),
        "mor": run_mode(spark, "mor", n_epochs, per_epoch, n_convs),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

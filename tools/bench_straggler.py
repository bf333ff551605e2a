"""Straggler A/B for the MoR branch grouping (VERDICT r3 item 2 evidence).

Builds a merge-on-read table where ONE bucket holds ~10x the bytes of every
other bucket (incompressible payloads), then times the bucket-local read
under three task layouts:

* ``per-bucket``      — one branch task per bucket (no grouping)
* ``lpt-bytes``       — byte-weighted greedy LPT grouping (the engine's
                        ``_pack_groups_by_bytes``), max_branches groups
* ``count-chunk``     — the pre-round-4 behavior, simulated: buckets chained
                        into max_branches groups by COUNT, ignoring bytes

The claim under test: LPT isolates the fat bucket in its own task, so its
wall ≈ the per-bucket wall; count-chunking chains the fat bucket behind
unrelated buckets in one task and the straggler task bounds the whole read.

Usage: python tools/bench_straggler.py [n_hot_rows] [max_branches] [trials]
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mas_scada_bulkingest_spark.lake import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.streaming.driver import build_session

CHANGE_COLS = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz"


def _force(df) -> float:
    t0 = time.perf_counter()
    df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")).agg(
        F.bit_xor("_h")
    ).collect()
    return time.perf_counter() - t0


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    max_branches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = build_session(app_name="straggler", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="straggler_", dir=base)
    tbl = create_transcripts_table(spark, work + "/t", n_buckets=16, mode="mor")

    # JVM-side generation (no Python rows): one hot conversation holding
    # ~6x the bytes of each cold bucket, incompressible sha2 payloads
    def payload(k: int):
        return F.concat(
            *[
                F.sha2(
                    F.concat(F.col("id").cast("string"), F.lit(f":{j}:{k}")), 256
                )
                for j in range(10)
            ]
        )

    t = F.lit(datetime(2024, 1, 1)).cast("timestamp_ntz")
    hot = spark.range(n_hot).select(
        (F.col("id") + 1).alias("lsn"),
        F.lit("insert").alias("op"),
        F.lit("hotconv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        payload(0).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        t.alias("ts"),
    )
    # enough cold volume that chaining even a few cold buckets behind the
    # fat one visibly lengthens that task (fat ~= 6x one cold bucket)
    n_cold = 4 * n_hot  # spread over 60 conversations -> ~15 other buckets
    cold = spark.range(n_cold).select(
        (F.lit(10**7) + F.col("id")).alias("lsn"),
        F.lit("insert").alias("op"),
        F.concat(F.lit("cold"), F.pmod("id", F.lit(60))).alias("conv_id"),
        (F.col("id") / 60).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        payload(1).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        t.alias("ts"),
    )
    apply_changes(tbl, hot.unionByName(cold), 0)

    sizes = tbl._snapshot["file_sizes"]
    by_bucket = {
        b: sum(sizes[f] for f in fs)
        for b, fs in tbl._snapshot["buckets"].items()
    }
    fat = max(by_bucket, key=by_bucket.get)
    rest = [v for b, v in by_bucket.items() if b != fat]
    print(
        f"buckets={len(by_bucket)} fat_bucket={fat} "
        f"fat_bytes={by_bucket[fat]} median_other={sorted(rest)[len(rest)//2]}"
    )

    def count_chunk(groups, nb):
        # pre-round-4 behavior: chain buckets into nb groups by COUNT
        out = []
        step = (len(groups) + nb - 1) // nb
        for i in range(0, len(groups), step):
            chunk = groups[i : i + step]
            out.append((chunk[0][0], [f for _, fs in chunk for f in fs]))
        return out

    lpt = SnapshotTable._pack_groups_by_bytes
    results: dict[str, list[float]] = {"per-bucket": [], "lpt-bytes": [], "count-chunk": []}
    for _ in range(trials):
        tbl._collapsed_plan_cache = None
        results["per-bucket"].append(_force(tbl.read()))
        tbl._collapsed_plan_cache = None
        tbl._pack_groups_by_bytes = lpt.__get__(tbl)
        results["lpt-bytes"].append(_force(tbl.read(max_branches=max_branches)))
        tbl._collapsed_plan_cache = None
        tbl._pack_groups_by_bytes = lambda groups, nb: count_chunk(groups, nb)
        results["count-chunk"].append(_force(tbl.read(max_branches=max_branches)))
        del tbl._pack_groups_by_bytes

    for name, walls in results.items():
        print(f"{name:12s} min={min(walls):.2f}s walls={[round(w, 2) for w in walls]}")
    spark.stop()


if __name__ == "__main__":
    main()

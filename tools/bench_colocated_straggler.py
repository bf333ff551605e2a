"""Straggler A/B for the colocated-join branch grouping (VERDICT r4 item 6).

The storage-partitioned join shares the MoR read's one-task-per-branch
shape and its byte-weighted LPT grouping (``_pack_aligned`` weighs a bucket
by BOTH sides' manifest bytes), but until this bench only the read path had
a measured skew A/B (tools/bench_straggler.py). Same setup here: one bucket
holds ~6-10x the bytes of every other (incompressible sha2 payloads on one
hot conversation), joined against a co-bucketed rollup under three layouts:

* ``per-bucket``   — one SortMergeJoin branch per bucket (no grouping)
* ``lpt-bytes``    — the engine's combined-bytes LPT, max_branches groups
* ``count-chunk``  — buckets chained into max_branches groups by COUNT,
                     ignoring bytes (the naive grouping)

Claim: LPT isolates the fat bucket in its own branch task, so the grouped
join's wall ~= the per-bucket wall; count-chunking chains the fat bucket
behind unrelated buckets in one task, and that straggler task bounds the
whole join.

Usage: python tools/bench_colocated_straggler.py [n_hot] [max_branches] [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mas_scada_bulkingest_spark.derived import (  # noqa: E402
    create_conversation_rollup,
    refresh_rollup,
)
from mas_scada_bulkingest_spark.operators import colocated as co  # noqa: E402
from mas_scada_bulkingest_spark.pipeline import (  # noqa: E402
    apply_changes,
    create_transcripts_table,
)
from mas_scada_bulkingest_spark.streaming.driver import build_session  # noqa: E402


def _payload(k: int):
    return F.concat(
        *[
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{j}:{k}")), 256)
            for j in range(10)
        ]
    )


def _consume(df) -> float:
    t0 = time.perf_counter()
    df.agg(F.sum(F.length("text")), F.sum("live_turns"), F.count("*")).collect()
    return time.perf_counter() - t0


def _count_chunk(bucket_ids, group_maps, tables, nb):
    """Naive grouping: chain sorted bucket ids into nb slots by count."""
    ids = sorted(bucket_ids)
    step = (len(ids) + nb - 1) // nb
    return [ids[i : i + step] for i in range(0, len(ids), step)]


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    max_branches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="spj_straggler_", dir=base)
    spark = build_session(
        app_name="spj-straggler",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.local.dir": os.path.join(work, "spark-local")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        facts = create_transcripts_table(
            spark, work + "/facts", n_buckets=16, mode="mor"
        )
        t = F.lit(datetime(2024, 1, 1)).cast("timestamp_ntz")
        hot = spark.range(n_hot).select(
            (F.col("id") + 1).alias("lsn"),
            F.lit("insert").alias("op"),
            F.lit("hotconv").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            _payload(0).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            t.alias("ts"),
        )
        n_cold = 4 * n_hot
        cold = spark.range(n_cold).select(
            (F.lit(10**7) + F.col("id")).alias("lsn"),
            F.lit("insert").alias("op"),
            F.concat(F.lit("cold"), F.pmod("id", F.lit(60))).alias("conv_id"),
            (F.col("id") / 60).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            _payload(1).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            t.alias("ts"),
        )
        apply_changes(facts, hot.unionByName(cold), 0)
        rollup = create_conversation_rollup(spark, work + "/rollup", n_buckets=16)
        refresh_rollup(facts, rollup)

        sizes = facts._snapshot["file_sizes"]
        by_bucket = {
            b: sum(sizes[f] for f in fs)
            for b, fs in facts._snapshot["buckets"].items()
        }
        fat = max(by_bucket, key=by_bucket.get)
        rest = sorted(v for b, v in by_bucket.items() if b != fat)

        def join(mb):
            return co.colocated_join(
                facts,
                rollup,
                on=["conv_id"],
                select_left=["text"],
                select_right=["live_turns"],
                max_branches=mb,
            )

        n_rows = join(None).count()
        assert n_rows == n_hot + n_cold

        lpt = co._pack_aligned
        results = {"per-bucket": [], "lpt-bytes": [], "count-chunk": []}
        for _ in range(trials):  # interleave so box drift hits all equally
            co._pack_aligned = lpt
            results["per-bucket"].append(_consume(join(None)))
            results["lpt-bytes"].append(_consume(join(max_branches)))
            co._pack_aligned = _count_chunk
            results["count-chunk"].append(_consume(join(max_branches)))
        co._pack_aligned = lpt

        print(
            json.dumps(
                {
                    "metric": "colocated_join_straggler_ab",
                    "n_rows": n_rows,
                    "n_buckets": 16,
                    "cores": cores,
                    "max_branches": max_branches,
                    "fat_bucket_bytes": by_bucket[fat],
                    "median_other_bytes": rest[len(rest) // 2],
                    "per_bucket_sec": round(min(results["per-bucket"]), 3),
                    "lpt_bytes_sec": round(min(results["lpt-bytes"]), 3),
                    "count_chunk_sec": round(min(results["count-chunk"]), 3),
                    "all": {k: [round(x, 3) for x in v] for k, v in results.items()},
                    "lpt_speedup_vs_count": round(
                        min(results["count-chunk"]) / min(results["lpt-bytes"]), 3
                    ),
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Derived-rollup maintenance cost: incremental refresh vs full rebuild.

Demonstrates the scale claim in derived.py: after a bulk build, folding a
small epoch (p% of conversations changed) into the persisted rollup costs
O(changed + affected buckets), while the rebuild path costs O(table) —
at 100 TB that gap is the difference between a per-micro-batch operation
and a nightly job.

Usage: python tools/bench_derived.py [n_convs] [pct_changed] [cores] [n_buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mas_scada_bulkingest_spark.derived import (  # noqa: E402
    create_conversation_rollup,
    rebuild_rollup,
    refresh_rollup,
)
from mas_scada_bulkingest_spark.pipeline import (  # noqa: E402
    apply_changes,
    create_transcripts_table,
)
from mas_scada_bulkingest_spark.sources.changelog_gen import (  # noqa: E402
    generate_changelog,
)
from mas_scada_bulkingest_spark.streaming.driver import build_session  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    if not 0 < pct <= 100:
        sys.exit(f"pct_changed must be in (0, 100], got {pct}")
    # hash-modulo selection: actual selectivity is 1/denom, which matches
    # pct only when 100/pct is (near-)integral — report the real fraction
    denom = max(1, round(100 / pct))

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench_derived_", dir=base)
    try:
        spark = build_session(
            cores=cores,
            shuffle_partitions=cores,
            extra_conf={"spark.local.dir": os.path.join(work, "spark-local")},
        )
        spark.sparkContext.setLogLevel("ERROR")
        man = generate_changelog(
            os.path.join(work, "log"), n_convs=n_convs, mean_turns=8,
            n_files=16, seed=7,
        )
        changes = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(work, "log")
        )
        src = create_transcripts_table(
            spark, os.path.join(work, "t"), n_buckets=n_buckets, mode="mor"
        )
        apply_changes(src, changes, epoch_id=0)
        n_rows = src.read().count()

        # derived built through epoch 0 (untimed)
        d_inc = create_conversation_rollup(spark, os.path.join(work, "d_inc"))
        refresh_rollup(src, d_inc)

        # a small epoch touching ~1/denom of conversations
        k = max(1, round(n_convs / denom))
        small = (
            changes.filter(
                F.abs(F.xxhash64("conv_id")) % F.lit(denom) == 0
            )
            .withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
            .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
        )
        apply_changes(src, small, epoch_id=1)

        t0 = time.perf_counter()
        st = refresh_rollup(src, d_inc)
        inc_sec = time.perf_counter() - t0

        d_full = create_conversation_rollup(spark, os.path.join(work, "d_full"))
        t0 = time.perf_counter()
        rebuild_rollup(src, d_full)
        full_sec = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "n_events": man.n_events,
                    "table_rows": n_rows,
                    "n_buckets": n_buckets,
                    "pct_changed": round(100 / denom, 4),
                    "changed_convs_target": k,
                    "refresh_applied": st.applied if st else 0,
                    "incremental_refresh_sec": round(inc_sec, 2),
                    "full_rebuild_sec": round(full_sec, 2),
                    "speedup": round(full_sec / max(inc_sec, 1e-9), 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Storage-partitioned join vs plain shuffle join: the cost of the two
Exchanges `colocated_join` removes.

Builds a facts table (replayed changelog, merge-on-read) and a co-bucketed
per-conversation rollup, then times the SAME join both ways:

* plain:     facts.read().join(rollup.read(), on=conv_id)  — Catalyst
             shuffles BOTH sides on the join key
* colocated: colocated_join(facts, rollup)                 — per-bucket
             SortMergeJoin, zero Exchange (plan pinned in
             tests/test_colocated.py)

Both paths consume the result with the same aggregate so the full join
output materializes. At sandbox scale the shuffle fits in memory — the
measured gap is the floor of what 100 TB pays, where the two table-sized
Exchanges dominate the job.

Usage: python tools/bench_colocated.py [n_convs] [cores] [n_buckets] [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mas_scada_bulkingest_spark.derived import (  # noqa: E402
    create_conversation_rollup,
    refresh_rollup,
)
from mas_scada_bulkingest_spark.operators.colocated import (  # noqa: E402
    colocated_join,
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench_spj_", dir=base)
    try:
        spark = build_session(
            cores=cores,
            shuffle_partitions=max(cores * 4, 32),
            extra_conf={"spark.local.dir": os.path.join(work, "spark-local")},
        )
        spark.sparkContext.setLogLevel("ERROR")
        log = os.path.join(work, "log")
        generate_changelog(log, n_convs=n_convs, mean_turns=8, n_files=4, seed=7)
        facts = create_transcripts_table(
            spark, os.path.join(work, "facts"), n_buckets=n_buckets, mode="mor"
        )
        for i in range(4):
            batch = spark.read.parquet(os.path.join(log, f"changes-{i:05d}.parquet"))
            apply_changes(facts, batch, epoch_id=i)
        rollup = create_conversation_rollup(
            spark, os.path.join(work, "rollup"), n_buckets=n_buckets
        )
        refresh_rollup(facts, rollup)
        n_facts = facts.read().count()
        n_dims = rollup.read().count()

        # the broadcast path must not rescue the plain join — the benchmark
        # models the large x large case where broadcast is impossible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def consume(df) -> float:
            t0 = time.perf_counter()
            df.agg(
                F.sum(F.length("text")), F.sum("live_turns"), F.count("*")
            ).collect()
            return time.perf_counter() - t0

        def plain():
            return (
                facts.read()
                .select("conv_id", "text")
                .join(
                    rollup.read().select("conv_id", "live_turns"),
                    on="conv_id",
                )
            )

        def spj():
            return colocated_join(
                facts,
                rollup,
                on=["conv_id"],
                select_left=["text"],
                select_right=["live_turns"],
            )

        rows = spj().count()
        assert rows == plain().count() == n_facts, "join results must agree"

        plain_s, spj_s = [], []
        for _ in range(trials):  # interleave so drift hits both equally
            plain_s.append(consume(plain()))
            spj_s.append(consume(spj()))
        print(
            json.dumps(
                {
                    "metric": "colocated_join_vs_shuffle_join",
                    "n_facts": n_facts,
                    "n_dims": n_dims,
                    "n_buckets": n_buckets,
                    "cores": cores,
                    "trials": trials,
                    "plain_join_sec": round(statistics.median(plain_s), 3),
                    "colocated_sec": round(statistics.median(spj_s), 3),
                    "plain_all": [round(s, 3) for s in plain_s],
                    "colocated_all": [round(s, 3) for s in spj_s],
                    "speedup": round(
                        statistics.median(plain_s) / statistics.median(spj_s), 3
                    ),
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""One-off diagnostic child: same job as _scaling_cluster_child.py but with
the Spark event log enabled, so the serial (non-scaling) component of the
cluster-mode replay can be decomposed into job/stage time vs driver gaps.

Usage (driver-side): spark-submit --py-files engine.zip \
    tools/_scaling_cluster_diag.py <n_executors> <changes_dir> <work_dir>
"""

import json
import os
import sys
import time

EXEC_MEM_MB = 7168


def main() -> None:
    n_exec = int(sys.argv[1])
    changes = sys.argv[2]
    work = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "mor"

    from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
    from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog
    from mas_scada_bulkingest_spark.streaming.driver import build_session, replay_batches

    evlog = os.path.join(work, "eventlog")
    os.makedirs(evlog, exist_ok=True)
    spark = build_session(
        master=f"local-cluster[{n_exec},1,{EXEC_MEM_MB + 1024}]",
        shuffle_partitions=n_exec,
        extra_conf={
            "spark.executor.memory": f"{EXEC_MEM_MB}m",
            "spark.local.dir": os.path.join(work, "spark-local"),
            "spark.sql.files.maxPartitionBytes": "32m",
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm_log = os.path.join(work, "warmlog")
    generate_changelog(warm_log, n_convs=300, mean_turns=4, n_files=2, seed=3)
    warm_tbl = create_transcripts_table(
        spark, os.path.join(work, "warm_t"), n_buckets=64, mode=mode
    )
    replay_batches(
        spark, warm_log, warm_tbl,
        files_per_epoch=2, auto_compact_files=8 if mode == "mor" else None,
    )
    warm_tbl.read().count()

    table = create_transcripts_table(
        spark, os.path.join(work, f"t{n_exec}"), n_buckets=64, mode=mode
    )
    t0 = time.perf_counter()
    mark0 = time.time() * 1000  # wall-clock ms, comparable to event-log timestamps
    replay_batches(
        spark, changes, table,
        files_per_epoch=64, auto_compact_files=8 if mode == "mor" else None,
    )
    mark1 = time.time() * 1000
    dt = time.perf_counter() - t0
    spark.stop()

    # decompose the timed region from the event log: job spans vs gaps
    import glob

    jobs, stages = [], []
    paths = [p for p in glob.glob(os.path.join(evlog, "**"), recursive=True)
             if os.path.isfile(p) and "zstd" not in p]
    for path in paths:
        starts, ends = {}, {}
        with open(path, errors="ignore") as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    ev = json.loads(line)
                    starts[ev["Job ID"]] = ev["Submission Time"]
                elif '"SparkListenerJobEnd"' in line:
                    ev = json.loads(line)
                    ends[ev["Job ID"]] = ev["Completion Time"]
                elif '"SparkListenerStageCompleted"' in line:
                    si = json.loads(line)["Stage Info"]
                    sub = si.get("Submission Time")
                    if sub and mark0 - 500 <= sub <= mark1 + 500:
                        stages.append({
                            "stage": si["Stage ID"],
                            "name": si["Stage Name"].split("\n")[0][:70],
                            "tasks": si["Number of Tasks"],
                            "ms": si["Completion Time"] - sub,
                            "start_off": round((sub - mark0) / 1000, 2),
                        })
        for jid, s in sorted(starts.items()):
            e = ends.get(jid)
            if e and s >= mark0 - 500 and s <= mark1 + 500:
                jobs.append({"job": jid, "ms": e - s, "start_off": round((s - mark0) / 1000, 2)})
    job_total = sum(j["ms"] for j in jobs) / 1000
    print(json.dumps({
        "executors": n_exec, "sec": round(dt, 1),
        "job_time_sec": round(job_total, 1),
        "driver_gap_sec": round(dt - job_total, 1),
        "jobs": jobs,
        "stages": sorted(stages, key=lambda s: s["start_off"]),
    }))


if __name__ == "__main__":
    main()

"""spark-submit child for the multi-executor scaling harness.

Launched by ``tools/bench_scaling_cluster.py`` as::

    spark-submit --py-files mas_scada_bulkingest_spark.zip \
        tools/_scaling_cluster_child.py <n_executors> <changes_dir> <work_dir>

The engine package is resolved from the ``--py-files`` zip — the exact
deployment recipe README.md documents for a real cluster. The session runs
on ``local-cluster[n,1,mem]``: a genuine standalone master + worker with
``n`` SEPARATE single-core executor JVMs registering over RPC, exchanging
shuffle blocks through the Netty transport — the closest sandbox rendering
of the north_rule's "N and 4N executors" (threads in one JVM share one
heap/GC; executor JVMs do not).

Protocol: warm the full merge path UNTIMED (tiny replay — steady-state
throughput excludes one-time JIT/plan-compile, which 10^10 events amortize
to zero), then the timed replay of the shared changelog, then the timed
bucket-local read. One JSON line on stdout.
"""

import json
import os
import subprocess
import sys
import time

EXEC_MEM_MB = 7168


def _repin_executors(n_exec: int) -> None:
    """Pin executor JVMs to ``SCALING_EXEC_CPUS`` and the driver JVM (+ this
    python process) to ``SCALING_DRIVER_CPUS`` — the cpuset analog of a
    cgroup-capped executor container.

    The parent pins the whole spark-submit tree to driver∪executor CPUs
    (affinity is inherited), which lets the LONE lo-level executor borrow the
    mostly-idle driver core — silently giving the 1-executor level ~2 cores
    of silicon and deflating the measured N→4N ratio. Here, once the
    standalone master has launched all ``n_exec`` CoarseGrainedExecutorBackend
    JVMs (direct children of the driver JVM in local-cluster mode), each is
    re-pinned with ``taskset -a`` (all threads) to exactly the executor
    cpuset; pyspark worker daemons fork from the executors afterwards and
    inherit it. Per-executor resources are then constant at both levels and
    the driver core is a driver core at both levels.
    """
    exec_cpus = os.environ.get("SCALING_EXEC_CPUS")
    drv_cpus = os.environ.get("SCALING_DRIVER_CPUS")
    if not exec_cpus or not drv_cpus:
        return
    driver_jvm = os.getppid()
    deadline = time.time() + 60
    backends: list[int] = []
    while time.time() < deadline:
        backends = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read()
                with open(f"/proc/{pid}/stat") as fh:
                    ppid = int(fh.read().split(")")[-1].split()[1])
            except OSError:
                continue
            if b"CoarseGrainedExecutorBackend" in cmd and ppid == driver_jvm:
                backends.append(int(pid))
        if len(backends) >= n_exec:
            break
        time.sleep(0.2)
    if len(backends) < n_exec:
        print(
            f"repin: only {len(backends)}/{n_exec} executor JVMs found; "
            "leaving inherited affinity", file=sys.stderr,
        )
        return
    cpu_list = exec_cpus.split(",")
    spread = os.environ.get("SCALING_EXEC_SPREAD", "1") != "0" and len(
        cpu_list
    ) == len(backends)
    for i, pid in enumerate(sorted(backends)):
        # spread: executor i gets ITS OWN core (the 1-core-container model —
        # its JVM threads and forked python workers time-slice there and
        # nowhere else). A shared 4-CPU set measurably thrashes: 4 JVMs +
        # 4 python workers migrating across 4 CPUs ran 1.5-2.5x slower.
        cpus = cpu_list[i] if spread else exec_cpus
        r = subprocess.run(["taskset", "-a", "-pc", cpus, str(pid)],
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(f"repin: taskset failed for {pid}: {r.stderr.strip()}",
                  file=sys.stderr)
    for pid in (driver_jvm, os.getpid()):
        subprocess.run(["taskset", "-a", "-pc", drv_cpus, str(pid)],
                       capture_output=True)


def main() -> None:
    n_exec = int(sys.argv[1])
    changes = sys.argv[2]
    work = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "mor"

    from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
    from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog
    from mas_scada_bulkingest_spark.streaming.driver import build_session, replay_batches

    spark = build_session(
        master=f"local-cluster[{n_exec},1,{EXEC_MEM_MB + 1024}]",
        shuffle_partitions=n_exec * int(os.environ.get("SCALING_SHUFFLE_MULT", "1")),
        extra_conf={
            "spark.executor.memory": f"{EXEC_MEM_MB}m",
            "spark.local.dir": os.path.join(work, "spark-local"),
            # pack the scan into even waves instead of lumpy default splits
            # (same knob as the thread-level harness, tools/bench_scaling.py)
            "spark.sql.files.maxPartitionBytes": "32m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    _repin_executors(n_exec)  # before warm: python daemons inherit the pin

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
    replay_batches(
        spark, changes, table,
        files_per_epoch=64, auto_compact_files=8 if mode == "mor" else None,
    )
    dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    df = table.read(max_branches=4 * n_exec)
    n_rows = df.count()
    read_dt = time.perf_counter() - t0
    spark.stop()
    print(json.dumps(
        {"executors": n_exec, "sec": dt, "read_sec": read_dt, "rows": n_rows}
    ))


if __name__ == "__main__":
    main()

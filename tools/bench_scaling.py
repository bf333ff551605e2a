"""Throughput-scaling evidence: same CDC replay at taskset-pinned N vs 4N cores.

The north_rule's two-cluster-size criterion (throughput scaling efficiency
>= 0.8 from N to 4N executors) cannot use a real cluster in this sandbox, so
the identical job runs at two parallelism levels on identical input
(BASELINE.json; round instructions). Methodology (round 4 — controlled):

* Each trial runs in a fresh subprocess (fresh JVM, no warm caches) PINNED
  to a fixed cpuset via ``taskset -c``: the lo level gets exactly N CPUs,
  the hi level exactly 4N, disjoint fixed sets — the OS-level analog of a
  cgroup-capped executor, and it stops the scheduler from quietly giving a
  "1-core" JVM extra cores for GC/shuffle threads (which inflates the lo
  denominator and corrupts the ratio).
* Trials are INTERLEAVED lo,hi,lo,hi,… — this host's noisy-neighbor drift
  (same job 16-85 s minutes apart) hits both levels equally in expectation;
  sequential A-then-B is routinely inverted by it.
* The timed region excludes one-time JIT/plan-compile: each child first
  replays a tiny changelog through the SAME code path (plan shapes compile,
  codegen caches warm) into a throwaway table, untimed. At the north_rule's
  10^10-event scale those one-time costs amortize to zero; leaving them in
  the timed region charges a fixed serial cost against both levels and
  misstates steady-state throughput.
* Table + shuffle dirs live on tmpfs (/dev/shm): the sandbox's disk
  serializes >=8 concurrent writers — it would measure the disk, not the
  engine. A production cluster sizes disks per executor.
* Reported: per-level min + median + all raw walls, efficiency computed
  from BOTH (min-based and median-based); the spread is stated, not hidden.
* The host exposes 32 hardware threads (~16 physical cores): pure-CPU
  throughput 8->32 measures 3.1x, capping 8->32 "efficiency" at ~0.77, and
  the shared memory bus saturates ~400-450k ev/s — the headline N..4N pair
  therefore defaults to 1->4 (within the linear region).

Usage: python tools/bench_scaling.py [N] [n_convs] [trials] [mode]
Env: SCALING_CHANGES_DIR reuses a pre-generated changelog;
     SCALING_PIN=0 disables taskset pinning (falls back to unpinned local[N]).
Writes one JSON line to stdout; BENCH.md records the canonical run.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.streaming.driver import build_session, replay_batches
from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog

cores = int(sys.argv[1]); changes = sys.argv[2]; work = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "mor"
spark = build_session(cores=cores, shuffle_partitions=cores,
                      extra_conf={{"spark.local.dir": os.path.join(work, "spark-local"),
                                   # pack the scan into ~2 even waves per core
                                   # instead of 7-9 lumpy default partitions
                                   "spark.sql.files.maxPartitionBytes": "32m",
                                   "spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
# Warm the FULL merge path untimed: a tiny replay through the identical code
# path compiles the plan shapes / Janino classes / Python-side machinery that
# a steady-state 10^10-event deployment pays exactly once. The timed region
# then measures the job, not first-query JIT.
warm_log = os.path.join(work, "warmlog")
generate_changelog(warm_log, n_convs=300, mean_turns=4, n_files=2, seed=3)
warm_tbl = create_transcripts_table(spark, os.path.join(work, "warm_t"),
                                    n_buckets=64, mode=mode)
replay_batches(spark, warm_log, warm_tbl,
               files_per_epoch=2, auto_compact_files=8 if mode == "mor" else None)
warm_tbl.read().count()

table = create_transcripts_table(spark, os.path.join(work, f"t{{cores}}"),
                                 n_buckets=64, mode=mode)
t0 = time.perf_counter()
stats = replay_batches(spark, changes, table, files_per_epoch=64,
                       auto_compact_files=8 if mode == "mor" else None)
dt = time.perf_counter() - t0
# read-path scaling: materialize the final state through table.read()
# (for MoR that's the bucket-local exchange-free LWW collapse); branch
# count scales with the level like any partitioning would on a cluster
t0 = time.perf_counter()
df = table.read(max_branches=4 * cores)
n_rows = df.count()
read_dt = time.perf_counter() - t0
spark.stop()
print(json.dumps({{"cores": cores, "sec": dt, "read_sec": read_dt, "rows": n_rows}}))
"""


def _pinned_cmd(cores: int, cpu_base: int) -> list[str]:
    """taskset prefix pinning to `cores` CPUs starting at cpu_base."""
    if os.environ.get("SCALING_PIN", "1") == "0":
        return []
    cpus = ",".join(str(cpu_base + i) for i in range(cores))
    return ["taskset", "-c", cpus]


def _read_cpuset_stat(cpus: list[int]) -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) summed over `cpus` from /proc/stat.

    Steal time is the hypervisor-reported share of wall time this guest's
    vCPU was runnable but NOT running because the host scheduled someone
    else — the direct, objective measure of the noisy-neighbor interference
    that inflates trial walls on this shared sandbox. Sampling it around
    each trial turns 'that 149 s hi wall is physically impossible' from a
    narrative into a number."""
    steal = total = 0
    want = {f"cpu{c}" for c in cpus}
    with open("/proc/stat") as fh:
        for line in fh:
            parts = line.split()
            if parts and parts[0] in want:
                vals = [int(x) for x in parts[1:]]
                steal += vals[7] if len(vals) > 7 else 0
                total += sum(vals)
    return steal, total


def run_trial(cores: int, cpu_base: int, changes: str, repo: str, mode: str) -> dict:
    script = _CHILD.format(repo=repo)
    work = tempfile.mkdtemp(prefix=f"scale{cores}_", dir="/dev/shm")
    cpus = list(range(cpu_base, cpu_base + cores))
    try:
        s0, t0 = _read_cpuset_stat(cpus)
        out = subprocess.run(
            [*_pinned_cmd(cores, cpu_base), sys.executable, "-c", script,
             str(cores), changes, work, mode],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "SPARK_DRIVER_MEMORY": "24g"},
        )
        s1, t1 = _read_cpuset_stat(cpus)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                res = json.loads(line)
                # steal fraction over the whole child lifetime (startup +
                # warmup + timed region) on exactly the pinned cpuset
                res["steal_frac"] = round((s1 - s0) / max(1, t1 - t0), 4)
                return res
        raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-3000:]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 640_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    mode = sys.argv[4] if len(sys.argv) > 4 else "mor"
    reuse = os.environ.get("SCALING_CHANGES_DIR")
    gen_dir = None
    if reuse and os.path.isdir(reuse):
        changes = reuse
        import glob as _glob

        import pyarrow.parquet as _pq

        _files = sorted(_glob.glob(os.path.join(reuse, "*.parquet")))
        _rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in _files)

        class _M:  # minimal manifest stand-in for a pre-generated log
            n_events = _rows
            files = _files

        man = _M()
    else:
        gen_dir = tempfile.mkdtemp(prefix="bench_scaling_", dir="/dev/shm")
        changes = os.path.join(gen_dir, "changes")
        man = generate_changelog(changes, n_convs=n_convs, mean_turns=8, n_files=64, seed=7)
    print(f"changelog: {man.n_events} events, {len(man.files)} files", file=sys.stderr)

    # disjoint fixed cpusets: lo on [LO_BASE, +n), hi on [HI_BASE, +4n) —
    # both away from CPUs 0-1 where kernel/interrupt work tends to land.
    # The bases are env-overridable because host co-tenant pressure is
    # sometimes LOCALIZED to a guest-CPU range (measured: a 4-wide busy
    # loop on cpus 8-11 ran 40% slower than on any other group while a
    # neighbor was hot) — pinning into such a range corrupts one level
    # only and fakes a scaling collapse. Scan with a busy loop first.
    lo_base = int(os.environ.get("SCALING_LO_BASE", "2"))
    hi_base = int(os.environ.get("SCALING_HI_BASE", "8"))
    lo_runs, hi_runs = [], []
    for t in range(trials):
        lo_runs.append(run_trial(n, lo_base, changes, repo, mode))
        hi_runs.append(run_trial(4 * n, hi_base, changes, repo, mode))
        print(
            f"trial {t + 1}/{trials}: lo {lo_runs[-1]['sec']:.1f}s "
            f"(steal {lo_runs[-1].get('steal_frac', 0):.1%}) "
            f"hi {hi_runs[-1]['sec']:.1f}s "
            f"(steal {hi_runs[-1].get('steal_frac', 0):.1%}) "
            f"(eff {(lo_runs[-1]['sec'] / hi_runs[-1]['sec']) / 4:.3f})",
            file=sys.stderr,
        )
    if gen_dir:
        shutil.rmtree(gen_dir, ignore_errors=True)

    lo_secs = [r["sec"] for r in lo_runs]
    hi_secs = [r["sec"] for r in hi_runs]
    lo_min, hi_min = min(lo_secs), min(hi_secs)
    lo_med, hi_med = statistics.median(lo_secs), statistics.median(hi_secs)
    # paired per-trial ratios: the estimator interleaving exists FOR —
    # ambient interference during trial t hits that trial's lo and hi
    # measurements under the same conditions
    trial_effs = [
        round((lo / hi) / 4.0, 3) for lo, hi in zip(lo_secs, hi_secs)
    ]
    lo_reads = [r["read_sec"] for r in lo_runs]
    hi_reads = [r["read_sec"] for r in hi_runs]
    print(
        json.dumps(
            {
                "mode": mode,
                "pinned": os.environ.get("SCALING_PIN", "1") != "0",
                "n_events": man.n_events,
                "rows_final": hi_runs[0]["rows"],
                "pair": f"{n}->{4 * n}",
                "cpusets": [
                    f"{lo_base}-{lo_base + n - 1}",
                    f"{hi_base}-{hi_base + 4 * n - 1}",
                ],
                f"local[{n}]_sec_min": round(lo_min, 2),
                f"local[{n}]_sec_median": round(lo_med, 2),
                f"local[{4 * n}]_sec_min": round(hi_min, 2),
                f"local[{4 * n}]_sec_median": round(hi_med, 2),
                "raw_lo_secs": [round(s, 2) for s in lo_secs],
                "raw_hi_secs": [round(s, 2) for s in hi_secs],
                "lo_steal_fracs": [r.get("steal_frac", 0) for r in lo_runs],
                "hi_steal_fracs": [r.get("steal_frac", 0) for r in hi_runs],
                f"events_per_sec_{n}": round(man.n_events / lo_min, 1),
                f"events_per_sec_{4 * n}": round(man.n_events / hi_min, 1),
                "scaling_efficiency_min": round((lo_min / hi_min) / 4.0, 3),
                "scaling_efficiency_median": round((lo_med / hi_med) / 4.0, 3),
                "trial_efficiencies": trial_effs,
                "scaling_efficiency_paired_median": round(
                    statistics.median(trial_effs), 3
                ),
                "read_sec_lo_min": round(min(lo_reads), 2),
                "read_sec_hi_min": round(min(hi_reads), 2),
                "read_scaling_efficiency_min": round(
                    (min(lo_reads) / min(hi_reads)) / 4.0, 3
                ),
                "trials": trials,
            }
        )
    )


if __name__ == "__main__":
    main()

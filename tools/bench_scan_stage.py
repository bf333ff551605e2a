"""Scan-stage encoding A/B at pinned 1 vs 4 cores (VERDICT r4 item 2).

Round 4's stage decomposition localized the single sub-0.8 scaling stage
of the flagship replay in scan+partial-agg (zstd decode + map-side LWW
collapse, 0.72 at 1→4 pinned cores; every post-scan stage ≥ 0.90). This
harness isolates EXACTLY that stage — ``collapse_lww`` over the changelog,
forced through its map-side partial aggregation — and A/Bs the concrete
encoding levers the verdict named, at identical logical content:

* ``zstd``        — the current default (pyarrow level default)
* ``zstd-l3``     — heavier compression: fewer bytes over the shared bus
                    for more (per-core, scalable) decompress CPU
* ``lz4``         — cheaper decompress, more bytes over the bus
* ``zstd-delta``  — zstd + DELTA_BINARY_PACKED for lsn/turn_idx and
                    explicit dictionary for the low-cardinality strings
* ``snappy``      — the r1-era baseline, for the record

Methodology matches tools/bench_scaling.py: fresh taskset-pinned
subprocess per trial, disjoint cpusets ({2} lo / {8-11} hi), interleaved
trials, untimed same-code-path warmup, tmpfs work dirs, per-trial steal
sampling. Reported per variant: file MB, per-level min walls, min-based
1→4 ratio.

Usage: python tools/bench_scan_stage.py [n_convs] [trials] [variants...]
Env:   SCALING_PIN=0 disables pinning.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import _read_cpuset_stat  # noqa: E402 — same steal meter

VARIANTS: dict[str, dict] = {
    "zstd": {"compression": "zstd"},
    "zstd-l3": {"compression": "zstd", "write_options": {"compression_level": 3}},
    "lz4": {"compression": "lz4"},
    "zstd-delta": {
        "compression": "zstd",
        "write_options": {
            "use_dictionary": ["op", "role", "tool", "conv_id", "metadata"],
            "column_encoding": {
                "lsn": "DELTA_BINARY_PACKED",
                "turn_idx": "DELTA_BINARY_PACKED",
            },
        },
    },
    "snappy": {"compression": "snappy"},
}

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from mas_scada_bulkingest_spark.operators.lww import collapse_lww
from mas_scada_bulkingest_spark.streaming.driver import build_session
from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog

cores = int(sys.argv[1]); changes = sys.argv[2]; work = sys.argv[3]
spark = build_session(cores=cores, shuffle_partitions=cores,
                      extra_conf={{"spark.local.dir": os.path.join(work, "sl"),
                                   "spark.sql.files.maxPartitionBytes": "32m",
                                   "spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
# untimed warm: same plan shape on a tiny log
warm = os.path.join(work, "warm")
generate_changelog(warm, n_convs=300, mean_turns=4, n_files=2, seed=3)
collapse_lww(spark.read.option("mergeSchema", "true").parquet(warm)).count()

t0 = time.perf_counter()
df = collapse_lww(spark.read.option("mergeSchema", "true").parquet(changes))
n = df.count()
dt = time.perf_counter() - t0
spark.stop()
print(json.dumps({{"cores": cores, "sec": dt, "rows": n}}))
"""


def _pin(cpus: list[int]) -> list[str]:
    if os.environ.get("SCALING_PIN", "1") == "0":
        return []
    return ["taskset", "-c", ",".join(str(c) for c in cpus)]


def run_trial(cores: int, cpu_base: int, changes: str, repo: str) -> dict:
    work = tempfile.mkdtemp(prefix=f"scanstage{cores}_", dir="/dev/shm")
    cpus = list(range(cpu_base, cpu_base + cores))
    try:
        s0, t0 = _read_cpuset_stat(cpus)
        out = subprocess.run(
            [*_pin(cpus), sys.executable, "-c", _CHILD.format(repo=repo),
             str(cores), changes, work],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "SPARK_DRIVER_MEMORY": "12g"},
        )
        s1, t1 = _read_cpuset_stat(cpus)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                res = json.loads(line)
                res["steal_frac"] = round((s1 - s0) / max(1, t1 - t0), 4)
                return res
        raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-2000:]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(VARIANTS)

    staging = tempfile.mkdtemp(prefix="scanstage_", dir="/dev/shm")
    results = {}
    try:
        logs = {}
        for name in names:
            spec = VARIANTS[name]
            d = os.path.join(staging, name)
            man = generate_changelog(
                d, n_convs=n_convs, mean_turns=8, n_files=64, seed=7,
                compression=spec["compression"],
                write_options=spec.get("write_options"),
            )
            mb = sum(os.path.getsize(f) for f in man.files) / 1e6
            logs[name] = (d, man.n_events, round(mb, 1))
            print(f"{name}: {man.n_events} events, {mb:.1f} MB", file=sys.stderr)

        for name in names:
            d, n_events, mb = logs[name]
            lo, hi = [], []
            for t in range(trials):  # interleaved lo/hi per variant
                lo.append(run_trial(1, 2, d, repo))
                hi.append(run_trial(4, 8, d, repo))
                print(
                    f"{name} trial {t + 1}: lo {lo[-1]['sec']:.1f}s "
                    f"(steal {lo[-1]['steal_frac']:.2%}) "
                    f"hi {hi[-1]['sec']:.1f}s "
                    f"(steal {hi[-1]['steal_frac']:.2%})",
                    file=sys.stderr,
                )
            lo_min = min(r["sec"] for r in lo)
            hi_min = min(r["sec"] for r in hi)
            results[name] = {
                "file_mb": mb,
                "n_events": n_events,
                "lo_walls": [round(r["sec"], 2) for r in lo],
                "hi_walls": [round(r["sec"], 2) for r in hi],
                "lo_steal": [r["steal_frac"] for r in lo],
                "hi_steal": [r["steal_frac"] for r in hi],
                "lo_min_sec": round(lo_min, 2),
                "hi_min_sec": round(hi_min, 2),
                "ratio_1to4_min": round(lo_min / (4 * hi_min), 3),
            }
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    print(json.dumps({"metric": "scan_stage_encoding_ab", "variants": results}))


if __name__ == "__main__":
    main()

"""Two-PROCESS commit race (VERDICT r4 item 4).

The in-process suite (tests/test_concurrent_commit.py) proves the
CAS-rebase logic with two stale SnapshotTable instances in one JVM. The
reference never needed more — it is single-process by construction
(Connector.java:43-44). This engine's optimistic concurrency exists
precisely for separate writers, so this script races two REAL processes
(separate Python interpreters, separate JVMs) hammering interleaved
``merge_changes`` epochs on one table and then verifies:

* no lost snapshot: every epoch from both writers is committed;
* a handcrafted CRASHED WINNER (version CAS done, ``_CURRENT`` flip
  missing — planted before the race) is helped forward by the first
  child commit from another process, and its marker epoch survives;
* the final state equals the single-threaded oracle reduction of the
  full changelog (per-turn text equality under stable ordering);
* every bucket file either side committed is still referenced;
* ``verify_integrity`` passes (no dangling or orphan-registered files).

Run directly (prints one JSON line) or via tests/test_multiprocess_commit.py:

    python tools/race_commit.py [n_convs] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_race(
    spark,
    workdir: str,
    n_convs: int = 150,
    n_files: int = 8,
) -> dict:
    """Drive the race under an existing parent SparkSession; returns a
    report dict (raises AssertionError on any lost write)."""
    from mas_scada_bulkingest_spark.oracle import reduce_changelog_dir
    from mas_scada_bulkingest_spark.lake import SnapshotTable
    from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
    from mas_scada_bulkingest_spark.sources import generate_changelog

    log_dir = os.path.join(workdir, "log")
    table_path = os.path.join(workdir, "t")
    go_file = os.path.join(workdir, "GO")
    generate_changelog(
        log_dir, n_convs=n_convs, mean_turns=6, n_files=n_files, seed=1234
    )
    tbl0 = create_transcripts_table(spark, table_path, n_buckets=8, mode="mor")

    # handcraft a CRASHED WINNER before the race: a fully-formed next
    # version whose _CURRENT flip never happened (a writer that died
    # between the CAS hard-link and the pointer rename). The FIRST child
    # commit from another process must help it forward — its marker epoch
    # must survive the whole race.
    import json as _json

    cur = tbl0._snapshot
    orphan = {
        **cur,
        "version": cur["version"] + 1,
        "parent": cur["version"],
        "committed_epochs": sorted(
            {*map(str, cur["committed_epochs"]), "9999"}
        ),
    }
    with open(
        os.path.join(table_path, "snapshots", f"v{orphan['version']:08d}.json"),
        "w",
    ) as f:
        _json.dump(orphan, f)

    files = sorted(f for f in os.listdir(log_dir) if f.endswith(".parquet"))
    # interleave: child 0 gets even epochs, child 1 odd — maximal conflict
    specs = [
        ",".join(f"{i}:{f}" for i, f in enumerate(files) if i % 2 == p)
        for p in (0, 1)
    ]
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "race_commit_child.py")
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(child))}
    procs = [
        subprocess.Popen(
            [sys.executable, child, table_path, log_dir, go_file, spec],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            text=True,
        )
        for spec in specs
    ]
    # both children poll for this barrier after their Spark startup
    open(go_file, "w").close()
    outs = [p.communicate(timeout=600)[0] for p in procs]
    reports = []
    for p, out in zip(procs, outs):
        line = [ln for ln in out.splitlines() if ln.startswith("{")]
        reports.append(json.loads(line[-1]) if line else {"errors": [f"no output (rc={p.returncode})"]})

    for r in reports:
        assert not r.get("errors"), f"child failed: {r['errors']}"

    tbl = SnapshotTable(spark, table_path)
    committed = {int(e) for e in tbl.committed_epochs}
    assert committed == set(range(len(files))) | {9999}, (
        f"lost epochs: {sorted((set(range(len(files))) | {9999}) - committed)}"
    )
    assert tbl.is_epoch_committed(9999), (
        "crashed winner's commit was not helped forward across processes"
    )
    final = (
        tbl.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    ref = reduce_changelog_dir(log_dir).reset_index(drop=True)
    assert len(final) == len(ref), (len(final), len(ref))
    assert (final["conv_id"] == ref["conv_id"]).all()
    assert (final["turn_idx"].astype("int64") == ref["turn_idx"].astype("int64")).all()
    assert (final["text"] == ref["text"]).all(), "per-turn text mismatch"
    integ = tbl.verify_integrity()
    assert integ["ok"], integ
    return {
        "ok": True,
        "epochs": len(files),
        "rows": int(len(final)),
        "children": reports,
        "integrity_ok": bool(integ["ok"]),
    }


def main() -> int:
    from mas_scada_bulkingest_spark.streaming import build_session

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="race_commit_", dir=base)
    spark = build_session(app_name="race-parent", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        report = run_race(spark, workdir, n_convs=n_convs, n_files=n_files)
        print(json.dumps(report))
        return 0
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())

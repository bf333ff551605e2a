"""Child process for the two-process commit race (tools/race_commit.py).

Opens the shared table in its OWN JVM/Python process and applies its
assigned changelog files as epochs. Conflicts with the sibling process are
resolved by SnapshotTable's hard-link version CAS + MoR rebase — the very
mechanism the in-process tests (tests/test_concurrent_commit.py) prove at
the logic level and this script proves where ``os.link`` actually races:
two separate processes on one filesystem.

argv: table_path log_dir go_file epoch_spec
  epoch_spec = comma-separated "epoch_id:filename" pairs, applied in order.
Prints one JSON line {"applied": N, "noop": N, "errors": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    table_path, log_dir, go_file, epoch_spec = sys.argv[1:5]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mas_scada_bulkingest_spark.lake import SnapshotTable
    from mas_scada_bulkingest_spark.pipeline import apply_changes
    from mas_scada_bulkingest_spark.streaming import build_session

    spark = build_session(
        app_name=f"race-child-{os.getpid()}", cores=4, shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = SnapshotTable(spark, table_path)

    jobs = []
    for part in epoch_spec.split(","):
        eid, fname = part.split(":", 1)
        jobs.append((int(eid), os.path.join(log_dir, fname)))

    # barrier: both children finish Spark startup, then race for real
    while not os.path.exists(go_file):
        time.sleep(0.05)

    applied = noop = 0
    errors: list[str] = []
    for eid, path in jobs:
        try:
            batch = spark.read.option("mergeSchema", "true").parquet(path)
            st = apply_changes(table, batch, epoch_id=eid)
            if st.was_noop:
                noop += 1
            else:
                applied += 1
        except Exception as e:  # noqa: BLE001 — report, parent asserts
            errors.append(f"epoch {eid}: {type(e).__name__}: {e}")
    print(json.dumps({"applied": applied, "noop": noop, "errors": errors}))
    spark.stop()
    return 0 if not errors else 1


if __name__ == "__main__":
    raise SystemExit(main())

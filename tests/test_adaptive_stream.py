"""Adaptive cadence on the ACTUAL streaming path (SURVEY.md T1; reference
OffsetRecord.java:250-279): big catch-up epochs while behind, small epochs at
the tail, exactly-once preserved across the phase switch."""

from __future__ import annotations

import os
import shutil
import time

from mas_scada_bulkingest_spark import oracle
from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.sources import generate_changelog
from mas_scada_bulkingest_spark.status import epoch_summary
from mas_scada_bulkingest_spark.streaming.driver import (
    run_stream,
    run_stream_adaptive,
)

from conftest import assert_frames_equal

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "metadata"]


def _final(tbl):
    return tbl.read().orderBy("conv_id", "turn_idx").toPandas()[FINAL_COLS]


def test_adaptive_stream_big_catchup_then_small_tail(spark, tmpdir_path):
    # a 10-file log: 8 files are pre-existing backlog, 2 arrive at the tail
    staging = tmpdir_path + "/staging"
    log = tmpdir_path + "/log"
    generate_changelog(staging, n_convs=40, mean_turns=5, n_files=10, seed=41)
    ref = oracle.reduce_changelog_dir(staging)
    os.makedirs(log)
    files = sorted(os.listdir(staging))
    assert len(files) == 10
    for f in files[:8]:
        shutil.copy(os.path.join(staging, f), os.path.join(log, f))

    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    q = run_stream_adaptive(
        spark,
        log,
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        catchup_files_per_trigger=8,
        tail_files_per_trigger=1,
        tail_available_now=False,  # keep tailing for the late files
    )
    try:
        # late data lands while the tail phase is live
        for f in files[8:]:
            shutil.copy(os.path.join(staging, f), os.path.join(log, f))
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            tbl = SnapshotTable(spark, tmpdir_path + "/t")
            if tbl.committed_epoch_count >= 3:
                break
            time.sleep(1.0)
    finally:
        q.stop()
        q.awaitTermination()

    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    summary = epoch_summary(tbl).collect()
    # one big catch-up epoch (8 files), then one small epoch per tail file
    assert len(summary) == 3
    rows_of = [r["applied"] + r["skipped"] + r["deleted"] for r in summary]
    assert rows_of[0] > rows_of[1] and rows_of[0] > rows_of[2]
    # the final state equals the oracle over the WHOLE log (catch-up + tail)
    assert_frames_equal(_final(tbl), ref[FINAL_COLS])

    # exactly-once across the seam: re-draining the same checkpoint applies
    # nothing new and leaves the state bit-identical
    before = _final(tbl)
    q2 = run_stream(
        spark, log, tmpdir_path + "/t", tmpdir_path + "/ckpt",
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    tbl2 = SnapshotTable(spark, tmpdir_path + "/t")
    assert tbl2.committed_epoch_count == tbl.committed_epoch_count
    assert_frames_equal(_final(tbl2), before)

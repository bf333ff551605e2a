"""Streaming write-audit-publish: every micro-batch staged → audited →
published inside the foreachBatch loop (run_stream(wap_audit=...)).

Contracts pinned here: a passing audit produces the identical final state
as the direct streaming path (oracle equality); a rejecting audit fails the
stream, discards the staged bytes, and leaves the epoch replayable; a crash
between stage and publish resumes at the audit on replay instead of staging
a duplicate; the audit handle really sees the staged (not yet visible)
state.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from mas_scada_bulkingest_spark import oracle
from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.sources import generate_changelog
from mas_scada_bulkingest_spark.streaming.driver import run_stream

from conftest import assert_frames_equal

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "metadata"]


def _final(tbl):
    return tbl.read().orderBy("conv_id", "turn_idx").toPandas()[FINAL_COLS]


def _ckpt_ns(checkpoint_dir: str) -> str:
    return hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]


def test_stream_wap_drain_matches_oracle(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=30, mean_turns=5, seed=41)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
    audited = []

    def audit(staged_tbl, stats):
        # a real audit probe against the staged bytes: no NULL keys
        bad = staged_tbl.read().filter("conv_id IS NULL").limit(1).count()
        audited.append(stats.epoch_id)
        return bad == 0

    q = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        max_files_per_trigger=2,
        wap_audit=audit,
    )
    q.awaitTermination(120)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    assert_frames_equal(_final(tbl), ref[FINAL_COLS])
    assert len(audited) >= 2  # several micro-batches, each audited
    assert tbl.staged_refs() == []  # every stage was published


def test_stream_wap_rejection_fails_stream_and_discards(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=15, mean_turns=4, seed=42)
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")

    q = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        wap_audit=lambda staged, stats: False,  # reject everything
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)
        q.processAllAvailable()  # pragma: no cover - raises above
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    # nothing published, nothing staged left behind, no epoch committed
    assert tbl.read().count() == 0
    assert tbl.staged_refs() == []
    assert tbl.committed_epoch_count == 0
    # the epoch is replayable once the "upstream is fixed": same checkpoint,
    # passing audit → the data lands
    q2 = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        wap_audit=lambda staged, stats: True,
    )
    q2.awaitTermination(120)
    assert SnapshotTable(spark, tmpdir_path + "/t").read().count() > 0


def test_stream_wap_resumes_crashed_stage_at_audit(spark, tmpdir_path):
    """A stage that crashed before publish is found by the replayed batch
    and resumed at the audit — no duplicate stage, exactly-once holds."""
    generate_changelog(
        tmpdir_path + "/log", n_convs=10, mean_turns=3, n_files=2, seed=43
    )
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
    ckpt = tmpdir_path + "/ckpt"
    ns = _ckpt_ns(ckpt)
    # simulate the crash: batch 0 (the whole availableNow drain in one
    # trigger) was staged under its checkpoint-namespaced epoch id, then
    # the process died before the audit/publish
    whole_log = spark.read.option("mergeSchema", "true").parquet(tmpdir_path + "/log")
    st = apply_changes(tbl, whole_log, f"{ns}:0", stage=True)
    assert tbl.staged_refs() == [st.staged_ref]

    resumed = []

    def audit(staged_tbl, stats):
        resumed.append(stats.staged_ref)
        return True

    q = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        ckpt,
        max_files_per_trigger=None,  # one batch = the whole log
        wap_audit=audit,
    )
    q.awaitTermination(120)
    tbl2 = SnapshotTable(spark, tmpdir_path + "/t")
    # the replay resumed the EXISTING staged ref (no re-stage, no duplicate)
    assert resumed == [st.staged_ref]
    assert tbl2.staged_refs() == []
    assert tbl2.is_epoch_committed(f"{ns}:0")
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    assert_frames_equal(_final(tbl2), ref[FINAL_COLS])

"""Structured Streaming tail: availableNow drain == oracle, checkpoint resume,
and epoch-guard protection against checkpoint/sink divergence (SURVEY.md T1/T2)."""

from __future__ import annotations

import os
import shutil

from mas_scada_bulkingest_spark import oracle
from mas_scada_bulkingest_spark.lake.snapshot_table import SnapshotTable
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.sources import generate_changelog
from mas_scada_bulkingest_spark.streaming.driver import run_stream

from conftest import assert_frames_equal

FINAL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "metadata"]


def _final(tbl):
    return tbl.read().orderBy("conv_id", "turn_idx").toPandas()[FINAL_COLS]


def test_stream_drain_matches_oracle(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=40, mean_turns=5, seed=31)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    q = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        max_files_per_trigger=2,
    )
    q.awaitTermination(120)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    assert_frames_equal(_final(tbl), ref[FINAL_COLS])


def test_stream_resume_after_checkpoint_loss_is_noop(spark, tmpdir_path):
    """Even if the streaming checkpoint is lost entirely (worst case: the
    whole log is re-delivered as new epochs), the snapshot's committed state
    keeps the final table correct — re-applied mutations lose LWW or match
    exactly. This is strictly stronger than the reference, which duplicates
    rows when its offset file lags the upload (SURVEY.md §3.1)."""
    generate_changelog(tmpdir_path + "/log", n_convs=20, mean_turns=4, seed=32)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    q = run_stream(spark, tmpdir_path + "/log", tmpdir_path + "/t", tmpdir_path + "/ck1")
    q.awaitTermination(120)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    before = _final(tbl)
    shutil.rmtree(tmpdir_path + "/ck1")  # lose the checkpoint
    q2 = run_stream(spark, tmpdir_path + "/log", tmpdir_path + "/t", tmpdir_path + "/ck2")
    q2.awaitTermination(120)
    tbl2 = SnapshotTable(spark, tmpdir_path + "/t")
    assert_frames_equal(_final(tbl2), before)
    assert_frames_equal(_final(tbl2), ref[FINAL_COLS])


def test_stream_mor_with_registry_matches_oracle(spark, tmpdir_path):
    """Full streaming integration on the scale path: merge-on-read sink +
    conversations registry maintained per micro-batch, auto-compaction on —
    drained stream must equal the oracle and the registry must hold every
    conversation exactly once."""
    from mas_scada_bulkingest_spark.pipeline import create_conversations_registry

    generate_changelog(tmpdir_path + "/log", n_convs=30, mean_turns=5, seed=34)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4, mode="mor")
    reg = create_conversations_registry(spark, tmpdir_path + "/reg", n_buckets=2)
    q = run_stream(
        spark,
        tmpdir_path + "/log",
        tmpdir_path + "/t",
        tmpdir_path + "/ckpt",
        max_files_per_trigger=2,
        auto_compact_files=3,
        registry=reg,
    )
    q.awaitTermination(120)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    assert tbl.mode == "mor"
    assert_frames_equal(_final(tbl), ref[FINAL_COLS])
    got = reg.read().toPandas()
    assert sorted(got.conv_id) == sorted(ref.conv_id.unique().tolist() + [
        c for c in set("conv-%d" % i for i in range(30)) - set(ref.conv_id)
    ])  # registry covers every conversation ever SEEN (even fully deleted ones)
    assert got.conv_id.is_unique


def test_stream_restart_with_checkpoint_skips_processed(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=20, mean_turns=4, seed=33)
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    q = run_stream(spark, tmpdir_path + "/log", tmpdir_path + "/t", tmpdir_path + "/ck")
    q.awaitTermination(120)
    tbl = SnapshotTable(spark, tmpdir_path + "/t")
    n_epochs = len(tbl.committed_epochs)
    # restart with the same checkpoint: no new files -> no new epochs
    q2 = run_stream(spark, tmpdir_path + "/log", tmpdir_path + "/t", tmpdir_path + "/ck")
    q2.awaitTermination(120)
    tbl2 = SnapshotTable(spark, tmpdir_path + "/t")
    assert len(tbl2.committed_epochs) == n_epochs


def test_supervise_restarts_crashed_stream_exactly_once(spark, tmpdir_path):
    """supervise() — the reference's restart-forever-with-backoff loop
    (ProcessTagData.java:47-65) around a checkpointed stream. A transient
    failure kills the query mid-run; the supervisor relaunches from the
    SAME checkpoint after backoff and the final table still equals the
    oracle exactly once (the re-delivered in-flight batch is a no-op or
    loses LWW)."""
    import hashlib as _hl

    from mas_scada_bulkingest_spark.pipeline import apply_changes
    from mas_scada_bulkingest_spark.schemas import CHANGE_SCHEMA_EVOLVED
    from mas_scada_bulkingest_spark.streaming.driver import supervise

    generate_changelog(tmpdir_path + "/log", n_convs=40, mean_turns=5, seed=31)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    poison = tmpdir_path + "/POISON"
    open(poison, "w").close()
    ns = _hl.md5(os.path.abspath(tmpdir_path + "/ckpt").encode()).hexdigest()[:8]
    tbl = SnapshotTable(spark, tmpdir_path + "/t")

    def _apply(batch_df, batch_id: int) -> None:
        if batch_id >= 1 and os.path.exists(poison):
            os.remove(poison)  # transient: fails once, succeeds on retry
            raise RuntimeError("injected transient sink failure")
        apply_changes(tbl, batch_df, f"{ns}:{batch_id}")

    def start():
        return (
            spark.readStream.schema(CHANGE_SCHEMA_EVOLVED)
            .option("maxFilesPerTrigger", 2)
            .parquet(tmpdir_path + "/log")
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", tmpdir_path + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    restarts = []
    out = supervise(
        start,
        backoff_secs=0.5,
        max_restarts=3,
        poll_secs=0.5,
        on_restart=lambda n, e: restarts.append(str(e)),
    )
    assert out["restarts"] == 1 and out["clean"]
    assert len(restarts) == 1 and "transient" in restarts[0]
    assert_frames_equal(_final(tbl), ref[FINAL_COLS])

    # permanently poisoned: max_restarts exhausts and the failure re-raises
    def always_fail():
        def _boom(batch_df, batch_id):
            raise RuntimeError("permanent")

        return (
            spark.readStream.schema(CHANGE_SCHEMA_EVOLVED)
            .parquet(tmpdir_path + "/log")
            .writeStream.foreachBatch(_boom)
            .option("checkpointLocation", tmpdir_path + "/ckpt_bad")
            .trigger(availableNow=True)
            .start()
        )

    import pytest as _pytest

    with _pytest.raises(Exception, match="permanent"):
        supervise(always_fail, backoff_secs=0.2, max_restarts=1, poll_secs=0.2)

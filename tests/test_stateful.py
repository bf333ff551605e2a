"""applyInPandasWithState per-conversation progress operator: cumulative
state across micro-batches must converge to the batch ground truth, and
survive a stream restart from checkpoint."""

from __future__ import annotations

import pandas as pd

from mas_scada_bulkingest_spark.schemas import CHANGE_SCHEMA_EVOLVED
from mas_scada_bulkingest_spark.sources import generate_changelog
from mas_scada_bulkingest_spark.streaming.stateful import conversation_progress


def _ground_truth(log_dir: str) -> pd.DataFrame:
    import glob

    df = pd.concat(
        [pd.read_parquet(p) for p in sorted(glob.glob(log_dir + "/*.parquet"))],
        ignore_index=True,
    )
    g = df.groupby("conv_id").agg(
        n_events=("lsn", "size"),
        n_deletes=("op", lambda s: int((s == "delete").sum())),
        max_turn=("turn_idx", "max"),
        max_lsn=("lsn", "max"),
        last_ts=("ts", "max"),
    )
    return g.reset_index().sort_values("conv_id").reset_index(drop=True)


def _final_progress(spark, out_dir: str) -> pd.DataFrame:
    import glob

    files = sorted(glob.glob(out_dir + "/*.parquet"))
    out = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    # every emission is appended; counters are monotone, so the final state
    # per conversation is the row with max n_events (ties by max_lsn)
    out = out.sort_values(["conv_id", "n_events", "max_lsn"])
    return (
        out.groupby("conv_id").tail(1).sort_values("conv_id").reset_index(drop=True)
    )


def _run(spark, log_dir, ckpt, out_dir, files_per_trigger=2):
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _sink(batch_df, batch_id):
        # epoch-suffixed file name: a replayed batch overwrites its own
        # output instead of duplicating it (idempotent file sink)
        batch_df.toPandas().to_parquet(
            os.path.join(out_dir, f"b{batch_id:05d}.parquet")
        )

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(log_dir)
    )
    q = (
        conversation_progress(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_progress_matches_ground_truth(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=25, mean_turns=5, seed=51)
    truth = _ground_truth(tmpdir_path + "/log")
    _run(spark, tmpdir_path + "/log", tmpdir_path + "/ck", tmpdir_path + "/out1")
    got = _final_progress(spark, tmpdir_path + "/out1")
    pd.testing.assert_frame_equal(
        got[["conv_id", "n_events", "n_deletes", "max_turn", "max_lsn", "last_ts"]],
        truth,
        check_dtype=False,
    )


def test_stateful_state_survives_restart(spark, tmpdir_path):
    """Stop after a partial drain, restart from the same checkpoint with
    MORE files present: counters continue from stored state instead of
    resetting (the reference's AtomicLong counters reset on crash)."""
    m = generate_changelog(tmpdir_path + "/log", n_convs=15, mean_turns=4, seed=52)
    # hold back the last 3 files, stream the rest
    import os, shutil

    held = m.files[-3:]
    for f in held:
        shutil.move(f, tmpdir_path + "/" + os.path.basename(f) + ".held")
    _run(spark, tmpdir_path + "/log", tmpdir_path + "/ck", tmpdir_path + "/out2")
    partial = _final_progress(spark, tmpdir_path + "/out2")
    # deliver the held files, restart with the SAME checkpoint
    for f in held:
        shutil.move(tmpdir_path + "/" + os.path.basename(f) + ".held", f)
    _run(spark, tmpdir_path + "/log", tmpdir_path + "/ck", tmpdir_path + "/out2")
    got = _final_progress(spark, tmpdir_path + "/out2")
    truth = _ground_truth(tmpdir_path + "/log")
    # the restarted query only re-emits conversations touched by NEW files,
    # but its state store carried the earlier counts — merge both views
    merged = (
        pd.concat([partial, got])
        .sort_values(["conv_id", "n_events", "max_lsn"])
        .groupby("conv_id")
        .tail(1)
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        merged[["conv_id", "n_events", "n_deletes", "max_turn", "max_lsn", "last_ts"]],
        truth,
        check_dtype=False,
    )

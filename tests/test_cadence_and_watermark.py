"""Adaptive catch-up/tail cadence (T1) + committed-epoch watermark folding."""

from __future__ import annotations

from mas_scada_bulkingest_spark.lake.snapshot_table import _fold_epochs
from mas_scada_bulkingest_spark.pipeline import create_transcripts_table
from mas_scada_bulkingest_spark.sources import generate_changelog
from mas_scada_bulkingest_spark.streaming.driver import replay_batches
from mas_scada_bulkingest_spark import oracle

from conftest import assert_frames_equal


def test_adaptive_cadence_epoch_sizes(spark, tmpdir_path):
    """8 files, catch-up window 3, tail 1: epochs consume 3,3 then the
    remaining backlog (2 <= window) drains in tail-sized epochs 1,1 —
    mirroring the reference's historical-vs-tail window sizing
    (OffsetRecord.java:250-279)."""
    generate_changelog(tmpdir_path + "/log", n_convs=30, mean_turns=5, seed=41)
    ref = oracle.reduce_changelog_dir(tmpdir_path + "/log")
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    stats = replay_batches(
        spark, tmpdir_path + "/log", tbl,
        files_per_epoch=3, files_per_epoch_tail=1,
    )
    assert len(stats) == 4  # 3 + 3 + 1 + 1
    got = tbl.read().orderBy("conv_id", "turn_idx").toPandas()
    cols = [c for c in ref.columns if c in got.columns]
    assert_frames_equal(got[cols].reset_index(drop=True), ref[cols])


def test_fold_epochs_watermark():
    extras = {"0", "1", "2", "5", "ns1:0", "ns1:1", "ns1:3", "weird"}
    folded, wm = _fold_epochs(extras, {})
    assert wm == {"": 2, "ns1": 1}
    assert folded == sorted(["5", "ns1:3", "weird"])
    # feeding the fold output back in with the gap filled advances W
    folded2, wm2 = _fold_epochs(set(folded) | {"3", "4", "ns1:2"}, wm)
    assert wm2 == {"": 5, "ns1": 3}
    assert folded2 == ["weird"]


def test_commit_log_stays_compact_and_replay_noop(spark, tmpdir_path):
    generate_changelog(tmpdir_path + "/log", n_convs=20, mean_turns=4, seed=42)
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    replay_batches(spark, tmpdir_path + "/log", tbl, files_per_epoch=1)  # 8 epochs
    # contiguous ids folded into the watermark; explicit list stays empty
    assert tbl._snapshot["epoch_watermarks"] == {"": 7}
    assert tbl._snapshot["committed_epochs"] == []
    assert tbl.committed_epochs == {str(i) for i in range(8)}
    assert tbl.is_epoch_committed(3) and not tbl.is_epoch_committed(8)
    again = replay_batches(spark, tmpdir_path + "/log", tbl, files_per_epoch=1)
    assert all(s.was_noop for s in again)

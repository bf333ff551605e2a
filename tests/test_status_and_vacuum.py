"""Status surface + vacuum maintenance (reference stats/CLI analog)."""

from __future__ import annotations

import glob
import os
from datetime import datetime

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.sources.changelog_gen import generate_changelog
from mas_scada_bulkingest_spark.status import epoch_summary, status
from mas_scada_bulkingest_spark.streaming.driver import replay_batches


def _replayed(spark, tmpdir_path, n_epoch_files=2):
    generate_changelog(tmpdir_path + "/log", n_convs=40, mean_turns=5, seed=31)
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=4)
    stats = replay_batches(spark, tmpdir_path + "/log", tbl, files_per_epoch=n_epoch_files)
    return tbl, stats


def test_status_totals_match_merge_stats(spark, tmpdir_path):
    tbl, stats = _replayed(spark, tmpdir_path)
    st = status(tbl)
    assert st["epochs_committed"] == len(stats)
    assert st["rows_applied"] == sum(s.applied for s in stats)
    assert st["rows_deleted"] == sum(s.deleted for s in stats)
    assert st["max_lsn"] == max(s.max_lsn for s in stats if s.max_lsn)
    assert st["n_data_files"] > 0
    summary = epoch_summary(tbl).toPandas()
    assert list(summary.epoch_id) == sorted(int(s.epoch_id) for s in stats)


def test_time_travel_read(spark, tmpdir_path):
    """Iceberg VERSION-AS-OF analog: each retained snapshot stays readable
    with its exact historical content until vacuum expires it."""
    tbl, stats = _replayed(spark, tmpdir_path)
    versions = tbl.versions()
    assert versions[0] == 0 and versions[-1] == tbl._snapshot["version"]
    v0 = tbl.read(version=0)
    assert v0.count() == 0  # empty table at creation
    # state after the FIRST epoch: rows == applied - deleted of epoch 0
    v1 = tbl.read(version=1)
    assert v1.count() == stats[0].applied
    # current == explicit latest version
    assert tbl.read(version=versions[-1]).count() == tbl.read().count()
    # vacuum(retain_versions=1) expires history; old versions now raise
    tbl.vacuum(retain_versions=1)
    assert tbl.versions() == [versions[-1]]
    try:
        tbl.at_version(1)
        raise AssertionError("expired snapshot must not be readable")
    except FileNotFoundError:
        pass


def test_vacuum_removes_only_superseded_files(spark, tmpdir_path):
    tbl, _ = _replayed(spark, tmpdir_path)
    before = tbl.read().orderBy("conv_id", "turn_idx").toPandas()
    all_parquet = glob.glob(tmpdir_path + "/t/data/**/*.parquet", recursive=True)
    live = {os.path.join(tmpdir_path, "t", f) for fs in tbl._snapshot["buckets"].values() for f in fs}
    superseded = [f for f in all_parquet if f not in live]
    assert superseded, "multi-epoch replay must leave superseded files"

    removed = tbl.vacuum()
    assert removed == len(superseded)
    # table content unchanged; current files intact
    after = tbl.read().orderBy("conv_id", "turn_idx").toPandas()
    assert before.equals(after)
    # idempotent
    assert tbl.vacuum() == 0


_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def test_vacuum_dry_run(spark, tmpdir_path):
    """VACUUM DRY RUN analog: reports the reclaimable parquet count,
    deletes nothing (files AND snapshots untouched); the real pass then
    deletes exactly that count."""
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    for e in range(3):
        rows = [(10 * e + i, "update", f"c{i}", 0, "u", "x", None,
                 datetime(2024, 1, 1, e, 0, i)) for i in range(4)]
        apply_changes(tbl, spark.createDataFrame(rows, _COLS), e)
    tbl.compact(max_files=1)  # supersede the delta files
    before_files = set(glob.glob(tmpdir_path + "/t/data/**/*.parquet", recursive=True))
    before_versions = tbl.versions()
    would = tbl.vacuum(retain_versions=1, dry_run=True)
    assert would > 0
    assert set(glob.glob(tmpdir_path + "/t/data/**/*.parquet", recursive=True)) == before_files
    assert tbl.versions() == before_versions
    assert tbl.vacuum(retain_versions=1) == would

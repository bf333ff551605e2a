"""history() metadata table + lineage crash-replay dedup.

Lineage rows are appended BEFORE the snapshot commit (so a crash between
append and commit re-appends them on replay — at-least-once by design);
``lineage()`` must collapse those duplicates or every downstream sum
(status(), epoch_summary(), the driver's lineage oracles) double-counts."""

from __future__ import annotations

import glob
import shutil
from datetime import datetime

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table
from mas_scada_bulkingest_spark.status import status

DDL = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp_ntz"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_lineage_dedupes_crash_replay_duplicates(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2)
    t = datetime(2024, 1, 1)
    apply_changes(tbl, _batch(spark, [(1, "insert", "conv-1", 0, "u", "a", None, t)]), 0)
    apply_changes(tbl, _batch(spark, [(2, "insert", "conv-2", 0, "u", "b", None, t)]), 1)
    before = status(tbl)
    assert before["rows_applied"] == 2
    # simulate crash-between-lineage-and-commit replay: epoch 0's lineage
    # file exists TWICE
    lf = glob.glob(tmpdir_path + "/t/lineage/lineage-0-*.parquet")[0]
    shutil.copy(lf, lf.replace(".parquet", "-replay.parquet"))
    after = status(tbl)
    assert after["rows_applied"] == 2  # not 3
    assert after["epochs_with_lineage"] == 2
    lin = tbl.lineage().toPandas()
    assert len(lin) == len(lin.drop_duplicates(["epoch_key", "partition_id"]))


def test_compact_lineage_preserves_totals(spark, tmpdir_path):
    import glob as _glob
    import shutil as _shutil

    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2)
    t = datetime(2024, 1, 1)
    for e in range(4):
        apply_changes(
            tbl,
            _batch(spark, [(e + 1, "insert", f"conv-{e}", 0, "u", "x", None, t)]),
            e,
        )
    # plus a crash-replay duplicate of epoch 0's lineage
    lf = _glob.glob(tmpdir_path + "/t/lineage/lineage-0-*.parquet")[0]
    _shutil.copy(lf, lf.replace(".parquet", "-replay.parquet"))
    before = status(tbl)
    n = tbl.compact_lineage()
    assert n == 5  # 4 epochs + the duplicate
    files = _glob.glob(tmpdir_path + "/t/lineage/*.parquet")
    assert len(files) == 1 and "compact" in files[0]
    after = status(tbl)
    for k in ("rows_applied", "rows_skipped", "rows_deleted", "epochs_with_lineage", "max_lsn"):
        assert after[k] == before[k], k
    assert tbl.compact_lineage() == 0  # single file: nothing to merge


def test_history_metadata_table(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, tmpdir_path + "/t", n_buckets=2, mode="mor")
    t = datetime(2024, 1, 1)
    apply_changes(tbl, _batch(spark, [(1, "insert", "conv-1", 0, "u", "a", None, t)]), 0)
    apply_changes(tbl, _batch(spark, [(2, "update", "conv-1", 0, "u", "a2", None, t)]), 1)
    h = {r["version"]: r for r in tbl.history().collect()}
    assert set(h) == {0, 1, 2}  # create + two epoch commits
    assert h[0]["parent"] is None and h[1]["parent"] == 0 and h[2]["parent"] == 1
    assert h[0]["epochs_committed"] == 0
    assert h[1]["epochs_committed"] == 1 and h[2]["epochs_committed"] == 2
    # each MoR epoch ADDS its delta files; live totals accumulate
    assert h[1]["files_added"] >= 1 and h[2]["files_added"] >= 1
    assert h[2]["live_files"] == h[1]["live_files"] + h[2]["files_added"]
    assert h[2]["live_bytes"] > h[1]["live_bytes"] > 0
    assert h[2]["bytes_added"] > 0
    assert all(r["n_buckets"] == 2 for r in h.values())
    # operation stamps (Delta DESCRIBE HISTORY operation column analog)
    assert h[0]["operation"] == "create"
    assert h[1]["operation"] == "merge" and h[2]["operation"] == "merge"
    tbl.delete_where("turn_idx = 99")  # no match: no commit, no history row
    tbl.compact(max_files=1)
    tbl.rename_column("tool", "tool_name")
    ops = {r["version"]: r["operation"] for r in tbl.history().collect()}
    assert ops[3] == "compact" and ops[4] == "rename_column"
    # pre-stamp snapshots fall back to write-origin inference
    import json as _json, os as _os

    sp = tmpdir_path + "/t/snapshots/v00000001.json"
    s = _json.load(open(sp))
    del s["operation"]
    _json.dump(s, open(sp, "w"))
    ops = {r["version"]: r["operation"] for r in tbl.history().collect()}
    assert ops[1] == "merge"  # inferred from the epoch= file prefix
    # vacuum expires old snapshots -> history shrinks to the retained window
    tbl.vacuum(retain_versions=1)
    assert [r["version"] for r in tbl.history().collect()] == [4]

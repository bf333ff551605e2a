"""TIMESTAMP AS OF time travel: every snapshot commit stamps wall-clock
``committed_at`` (write time — a staged epoch gets its publish instant);
``at_timestamp(ts)`` resolves the latest snapshot at or before ts, raising
when every retained snapshot postdates it. ``history()`` exposes the stamp.
"""

from __future__ import annotations

import time
from datetime import datetime

import pytest

from mas_scada_bulkingest_spark.pipeline import apply_changes, create_transcripts_table

_COLS = (
    "lsn long, op string, conv_id string, turn_idx int, role string,"
    " text string, tool string, ts timestamp_ntz"
)


def _apply(spark, tbl, rows, epoch):
    return apply_changes(tbl, spark.createDataFrame(rows, _COLS), epoch_id=epoch)


def test_at_timestamp_resolves_commit_order(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, f"{tmpdir_path}/t", n_buckets=2)
    before_any = time.time()
    time.sleep(0.05)
    _apply(spark, tbl, [(0, "update", "c0", 0, "u", "v1", None,
                         datetime(2024, 1, 1))], 0)
    t_after_e0 = time.time()
    time.sleep(0.05)
    _apply(spark, tbl, [(1, "update", "c0", 0, "u", "v2", None,
                         datetime(2024, 1, 2))], 1)

    # between the commits → the epoch-0 state
    old = tbl.at_timestamp(t_after_e0)
    assert [r["text"] for r in old.read().collect()] == ["v1"]
    # now → current state; datetime and ISO-string forms resolve identically
    assert [r["text"] for r in tbl.at_timestamp(time.time()).read().collect()] == ["v2"]
    iso = datetime.fromtimestamp(t_after_e0).isoformat()
    assert tbl.at_timestamp(datetime.fromtimestamp(t_after_e0))._snapshot[
        "version"
    ] == tbl.at_timestamp(iso)._snapshot["version"] == old._snapshot["version"]

    # before table creation → loud failure naming the earliest stamp
    with pytest.raises(ValueError, match="earliest retained"):
        tbl.at_timestamp(before_any - 10)

    # history() carries monotone non-null stamps
    h = sorted(tbl.history().collect(), key=lambda r: r["version"])
    stamps = [r["committed_at"] for r in h]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)


def test_vacuum_age_retention(spark, tmpdir_path):
    """vacuum(older_than_secs=S) retains every snapshot younger than S even
    when the version-count window would expire it; a tiny S falls back to
    the count window."""
    tbl = create_transcripts_table(spark, f"{tmpdir_path}/t", n_buckets=2)
    _apply(spark, tbl, [(0, "update", "c0", 0, "u", "v1", None,
                         datetime(2024, 1, 1))], 0)
    t_mid = time.time()
    time.sleep(0.05)
    _apply(spark, tbl, [(1, "update", "c0", 0, "u", "v2", None,
                         datetime(2024, 1, 2))], 1)
    before = tbl.versions()
    # everything committed within the last hour: nothing expires
    tbl.vacuum(retain_versions=1, older_than_secs=3600)
    assert tbl.versions() == before
    assert [r["text"] for r in tbl.at_timestamp(t_mid).read().collect()] == ["v1"]
    # age guarantee lapsed: the count window governs
    tbl.vacuum(retain_versions=1, older_than_secs=0.0)
    assert len(tbl.versions()) == 1
    with pytest.raises(ValueError):
        tbl.at_timestamp(t_mid)


def test_at_timestamp_respects_vacuum_expiry(spark, tmpdir_path):
    tbl = create_transcripts_table(spark, f"{tmpdir_path}/t", n_buckets=2)
    _apply(spark, tbl, [(0, "update", "c0", 0, "u", "v1", None,
                         datetime(2024, 1, 1))], 0)
    t_mid = time.time()
    time.sleep(0.05)
    _apply(spark, tbl, [(1, "update", "c0", 0, "u", "v2", None,
                         datetime(2024, 1, 2))], 1)
    tbl.vacuum(retain_versions=1)
    with pytest.raises(ValueError):
        tbl.at_timestamp(t_mid)  # the matching snapshot was expired

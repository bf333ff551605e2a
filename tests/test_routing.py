"""Fan-out routing sink (``route_changes``): one micro-batch → N tables by
first-match-wins regex, exactly-once PER TABLE under a shared epoch id
(reference monthly-table routing S3 + entity fan-out P4)."""

from __future__ import annotations

import glob
import os
import re

from conftest import assert_frames_equal
from mas_scada_bulkingest_spark.oracle import reduce_changelog_dir
from mas_scada_bulkingest_spark.pipeline import (
    apply_changes,
    create_transcripts_table,
    route_changes,
)
from mas_scada_bulkingest_spark.sources import generate_changelog

PATTERNS = [("single", r"conv-\d"), ("multi", r"conv-\d{2,}")]
DISCARD = [r"conv-13"]
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "metadata"]


def _read(tbl):
    df = tbl.read().orderBy("conv_id", "turn_idx").toPandas()
    return df[[c for c in COLS if c in df.columns]].reset_index(drop=True)


def _route_of(conv_id: str) -> str | None:
    if re.fullmatch(DISCARD[0], conv_id):
        return None
    for route, pat in PATTERNS:
        if re.fullmatch(pat, conv_id):
            return route
    return None


def test_route_changes_fans_out_and_replays_idempotently(spark, tmpdir_path):
    rd = lambda *fs: spark.read.option("mergeSchema", "true").parquet(*fs)
    generate_changelog(
        tmpdir_path + "/log", n_convs=60, mean_turns=4, n_files=4, seed=21
    )
    routes = {
        "single": create_transcripts_table(
            spark, tmpdir_path + "/single", n_buckets=4, mode="mor"
        ),
        "multi": create_transcripts_table(
            spark, tmpdir_path + "/multi", n_buckets=4, mode="cow"
        ),
    }
    files = sorted(glob.glob(tmpdir_path + "/log/*.parquet"))
    for e, f in enumerate(files):
        stats = route_changes(
            routes, rd(f), epoch_id=e, patterns=PATTERNS, discard=DISCARD,
            auto_compact_files=4,
        )
        assert set(stats) == {"single", "multi"}
        assert all(not s.was_noop for s in stats.values())

    ref = reduce_changelog_dir(tmpdir_path + "/log")
    ref["route"] = ref["conv_id"].map(_route_of)
    for route, tbl in routes.items():
        want = (
            ref[ref["route"] == route]
            .drop(columns=["route"])
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(want) > 0  # both routes genuinely populated
        assert_frames_equal(_read(tbl), want)
    # discard pattern really dropped conv-13 everywhere
    assert not any(
        (_read(t)["conv_id"] == "conv-13").any() for t in routes.values()
    )

    # full replay of every epoch: exactly-once per table, state unchanged
    before = {r: _read(t) for r, t in routes.items()}
    for e, f in enumerate(files):
        stats = route_changes(
            routes, rd(f), epoch_id=e, patterns=PATTERNS, discard=DISCARD
        )
        assert all(s.was_noop for s in stats.values())
    for r, t in routes.items():
        assert_frames_equal(_read(t), before[r])


def test_empty_route_slice_still_seals_the_epoch(spark, tmpdir_path):
    """A route receiving NO rows in an epoch must still commit the epoch id
    (otherwise a later replay of that epoch would re-apply the OTHER routes'
    no-ops but treat this table as never having seen it)."""
    from datetime import datetime

    DDL = (
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp_ntz"
    )
    routes = {
        "single": create_transcripts_table(spark, tmpdir_path + "/s", n_buckets=2),
        "multi": create_transcripts_table(spark, tmpdir_path + "/m", n_buckets=2),
    }
    batch = spark.createDataFrame(
        [(1, "insert", "conv-1", 0, "u", "a", None, datetime(2024, 1, 1))], DDL
    )
    stats = route_changes(routes, batch, 0, patterns=PATTERNS, discard=DISCARD)
    assert stats["single"].applied == 1
    assert stats["multi"].applied == 0
    assert routes["multi"].is_epoch_committed(0)
    assert routes["multi"].read().count() == 0
    again = route_changes(routes, batch, 0, patterns=PATTERNS, discard=DISCARD)
    assert all(s.was_noop for s in again.values())


def test_run_stream_routed_fans_out_from_checkpoint(spark, tmpdir_path):
    """The streaming form: the binlog tail routed into two tables through
    foreachBatch, checkpoint-namespaced epoch ids, union ≡ oracle."""
    from mas_scada_bulkingest_spark.streaming import run_stream_routed

    generate_changelog(
        tmpdir_path + "/log", n_convs=50, mean_turns=4, n_files=4, seed=44
    )
    routes = {
        "single": create_transcripts_table(
            spark, tmpdir_path + "/single", n_buckets=4, mode="mor"
        ),
        "multi": create_transcripts_table(
            spark, tmpdir_path + "/multi", n_buckets=4, mode="mor"
        ),
    }
    q = run_stream_routed(
        spark,
        tmpdir_path + "/log",
        routes,
        tmpdir_path + "/ckpt",
        patterns=PATTERNS,
        discard=DISCARD,
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)

    ref = reduce_changelog_dir(tmpdir_path + "/log")
    ref["route"] = ref["conv_id"].map(_route_of)
    for route, tbl in routes.items():
        want = (
            ref[ref["route"] == route]
            .drop(columns=["route"])
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert_frames_equal(_read(tbl), want)


def test_route_changes_resumes_after_partial_fanout(spark, tmpdir_path):
    """Crash between route commits: one destination already sealed the
    epoch, the other did not — retrying the WHOLE epoch must no-op the
    first and apply the second."""
    rd = lambda f: spark.read.parquet(f)
    generate_changelog(
        tmpdir_path + "/log", n_convs=40, mean_turns=3, n_files=2,
        seed=33, evolve_at_frac=None,
    )
    routes = {
        "single": create_transcripts_table(
            spark, tmpdir_path + "/single", n_buckets=4
        ),
        "multi": create_transcripts_table(
            spark, tmpdir_path + "/multi", n_buckets=4
        ),
    }
    f0 = sorted(glob.glob(tmpdir_path + "/log/*.parquet"))[0]
    batch = rd(f0)
    # simulate the pre-crash half: only the "single" route committed epoch 0
    from mas_scada_bulkingest_spark.operators.classify import classify_expr
    from pyspark.sql import functions as F

    half = batch.filter(
        classify_expr("conv_id", PATTERNS, discard=DISCARD) == "single"
    )
    st = apply_changes(routes["single"], half, epoch_id=0)
    assert not st.was_noop
    # retry the full fan-out for the same epoch
    stats = route_changes(
        routes, batch, epoch_id=0, patterns=PATTERNS, discard=DISCARD
    )
    assert stats["single"].was_noop is True
    assert stats["multi"].was_noop is False and stats["multi"].applied > 0

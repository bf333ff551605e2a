"""Edge-semantics tests for sessionization, stratified sampling, and
rank-selected quantiles (the oracle entries prove bulk parity; these pin
the boundary rules on rows where the expected answer is readable)."""

from __future__ import annotations

from datetime import datetime

from mas_scada_bulkingest_spark.queries import (
    _SAMPLE_SIXTEENTHS,
    _SESSION_GAP_SECS,
    q_doc_len_quantiles,
    q_sessionize,
    q_stratified_sample,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _run_sessionize(spark, rows, tmpdir_path):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmpdir_path}/events.parquet")
    return q_sessionize(spark, tmpdir_path).collect()


def test_session_boundary_is_strictly_greater_than_gap(spark, tmpdir_path):
    base = [
        # user 1: gap EXACTLY 1800 s -> same session; 1801 s -> new session
        (1, _ts("2024-01-01 00:00:00"), 1, "view", 1.0, "p"),
        (2, _ts("2024-01-01 00:30:00"), 1, "view", 1.0, "p"),
        (3, _ts("2024-01-01 01:00:01"), 1, "view", 1.0, "p"),
        # user 2: single event -> one session of one event
        (4, _ts("2024-01-01 05:00:00"), 2, "view", 2.5, "p"),
    ]
    rows = {
        (r["user_id"], r["session_idx"]): r
        for r in _run_sessionize(spark, base, tmpdir_path)
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    s11 = rows[(1, 1)]
    assert s11["n_events"] == 2  # inclusive gap bound: 1800 s stays
    assert s11["session_start"] == "2024-01-01 00:00:00"
    assert s11["session_end"] == "2024-01-01 00:30:00"
    s12 = rows[(1, 2)]
    assert s12["n_events"] == 1 and s12["session_start"] == "2024-01-01 01:00:01"
    assert rows[(2, 1)]["n_events"] == 1
    assert _SESSION_GAP_SECS == 1800


def test_session_boundary_uses_exact_microseconds(spark, tmpdir_path):
    # timestamps carry sub-second fractions; a second-truncated gap would
    # call 1800.5 s "1800" and keep the session. The boundary must honor
    # microsecond precision: gap 1800.000001 s splits, 1799.999999 s stays.
    from datetime import timedelta

    t0 = _ts("2024-01-01 00:00:00") + timedelta(microseconds=900000)
    rows = [
        (1, t0, 5, "view", 1.0, "p"),
        (2, t0 + timedelta(seconds=1800, microseconds=1), 5, "view", 1.0, "p"),
        (3, _ts("2024-01-02 00:00:00"), 6, "view", 1.0, "p"),
        (4, _ts("2024-01-02 00:00:00") + timedelta(seconds=1799, microseconds=999999),
         6, "view", 1.0, "p"),
    ]
    got = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in _run_sessionize(spark, rows, tmpdir_path)
    }
    assert got == {(5, 1): 1, (5, 2): 1, (6, 1): 2}


def test_sessionize_is_arrival_order_independent(spark, tmpdir_path):
    rows = [
        (10, _ts("2024-01-01 02:00:00"), 7, "view", 1.0, "p"),
        (11, _ts("2024-01-01 00:00:00"), 7, "view", 1.0, "p"),
        (12, _ts("2024-01-01 00:10:00"), 7, "view", 1.0, "p"),
    ]
    a = sorted(
        (r["session_idx"], r["session_start"], r["n_events"])
        for r in _run_sessionize(spark, rows, tmpdir_path)
    )
    b = sorted(
        (r["session_idx"], r["session_start"], r["n_events"])
        for r in _run_sessionize(spark, rows[::-1], tmpdir_path)
    )
    assert a == b == [
        (1, "2024-01-01 00:00:00", 2),
        (2, "2024-01-01 02:00:00", 1),
    ]


def test_stratified_sample_is_deterministic_and_downsamples_en(spark):
    sf = "/root/testdata/sf0.01"
    a = {r["lang"]: r for r in q_stratified_sample(spark, sf).collect()}
    b = {r["lang"]: r for r in q_stratified_sample(spark, sf).collect()}
    assert {k: v["n_sampled"] for k, v in a.items()} == {
        k: v["n_sampled"] for k, v in b.items()
    }
    # per-stratum rates honor the configured sixteenths (binomial slack)
    import duckdb

    totals = dict(
        duckdb.sql(
            f"SELECT lang, count(*) FROM '{sf}/documents.parquet' GROUP BY lang"
        ).fetchall()
    )
    for lang, row in a.items():
        keep = _SAMPLE_SIXTEENTHS.get(lang, _SAMPLE_SIXTEENTHS["_default"]) / 16
        frac = row["n_sampled"] / totals[lang]
        assert abs(frac - keep) < 0.25, (lang, frac, keep)


def test_quantiles_are_rank_selected_exact(spark, tmpdir_path):
    rows = [(f"d{i}", "t", "xx", "s", n) for i, n in enumerate([10, 20, 30, 40, 50])]
    spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmpdir_path}/documents.parquet")
    out = q_doc_len_quantiles(spark, tmpdir_path).collect()
    assert len(out) == 1
    r = out[0]
    # n=5: p50 -> rank ceil(2.5)=3 -> 30; p90 -> rank 5 -> 50; p99 -> rank 5
    assert (r["n_docs"], r["p50"], r["p90"], r["p99"]) == (5, 30, 50, 50)

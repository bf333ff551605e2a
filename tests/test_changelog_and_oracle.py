"""Generator determinism + oracle reducer sanity (SURVEY.md §5 carry-forward)."""

from __future__ import annotations

import os

import pandas as pd

from mas_scada_bulkingest_spark import oracle
from mas_scada_bulkingest_spark.sources import generate_changelog


def _read_all(d: str) -> pd.DataFrame:
    frames = [
        pd.read_parquet(os.path.join(d, f)) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    return pd.concat(frames, ignore_index=True)


def test_generator_deterministic(tmpdir_path):
    m1 = generate_changelog(tmpdir_path + "/a", n_convs=30, mean_turns=4, seed=11)
    m2 = generate_changelog(tmpdir_path + "/b", n_convs=30, mean_turns=4, seed=11)
    a, b = _read_all(tmpdir_path + "/a"), _read_all(tmpdir_path + "/b")
    pd.testing.assert_frame_equal(a, b)
    assert m1.n_events == m2.n_events


def test_generator_schema_evolution_point(tmpdir_path):
    m = generate_changelog(tmpdir_path + "/c", n_convs=30, mean_turns=4, seed=3)
    saw_plain = saw_meta = False
    for f in m.files:
        cols = set(pd.read_parquet(f).columns)
        if "metadata" in cols:
            saw_meta = True
        else:
            saw_plain = True
            assert not saw_meta, "pre-evolution files must come first"
    assert saw_plain and saw_meta


def test_generator_has_skew_dups_deletes(tmpdir_path):
    m = generate_changelog(tmpdir_path + "/d", n_convs=40, mean_turns=5, seed=5)
    df = _read_all(tmpdir_path + "/d")
    assert m.n_dups > 0 and df["lsn"].duplicated().sum() == m.n_dups
    counts = df[df.op == "update"].groupby("conv_id").size().sort_values()
    # Zipf head: hottest conversation gets far more updates than the median
    assert counts.iloc[-1] >= 5 * max(counts.median(), 1)
    # duplicates may re-deliver a delete, so count distinct lsns
    assert df[df.op == "delete"]["lsn"].nunique() == m.n_deletes


def test_oracle_lww_semantics():
    rows = pd.DataFrame(
        [
            # key (c,0): insert then late-ts update wins despite lower lsn order
            dict(lsn=1, op="insert", conv_id="c", turn_idx=0, role="user", text="v1",
                 tool=None, ts=pd.Timestamp("2024-01-01 00:00:10")),
            dict(lsn=2, op="update", conv_id="c", turn_idx=0, role="user", text="v2",
                 tool=None, ts=pd.Timestamp("2024-01-01 00:00:05")),  # older ts -> loses
            # key (c,1): delete wins
            dict(lsn=3, op="insert", conv_id="c", turn_idx=1, role="user", text="x",
                 tool=None, ts=pd.Timestamp("2024-01-01 00:00:01")),
            dict(lsn=4, op="delete", conv_id="c", turn_idx=1, role=None, text=None,
                 tool=None, ts=pd.Timestamp("2024-01-01 00:00:02")),
            # duplicate delivery of lsn=1
            dict(lsn=1, op="insert", conv_id="c", turn_idx=0, role="user", text="v1",
                 tool=None, ts=pd.Timestamp("2024-01-01 00:00:10")),
        ]
    )
    out = oracle.reduce_changelog(rows)
    assert len(out) == 1
    assert out.iloc[0]["text"] == "v1" and out.iloc[0]["lsn"] == 1

"""Property tests for the byte-LPT branch packers.

Greedy LPT guarantees max-slot load <= total/nb + max_item (each placement
goes to the lightest slot, so the final slot's load before its last item
was <= average). Both packers — the MoR read's ``_pack_groups_by_bytes``
and the colocated join's ``_pack_aligned`` (which resolves sizes through
the shared ``manifest_file_bytes``) — must honor that bound for ANY size
distribution, and must be deterministic."""

from __future__ import annotations

import os
from types import SimpleNamespace

from hypothesis import given, settings
from hypothesis import strategies as st

from mas_scada_bulkingest_spark.lake.snapshot_table import manifest_file_bytes
from mas_scada_bulkingest_spark.operators.colocated import _pack_aligned


def _fake_table(tmp_root: str, sizes_by_bucket: dict[int, list[int]]):
    """A stand-in with just the attrs _pack_aligned touches: ._snapshot
    ['file_sizes'] (relative-keyed) and .path; group map carries absolute
    paths, like _bucket_file_groups does."""
    file_sizes = {}
    groups = {}
    for b, szs in sizes_by_bucket.items():
        files = []
        for i, s in enumerate(szs):
            rel = f"data/b{b}/f{i}.parquet"
            file_sizes[rel] = s
            files.append(os.path.join(tmp_root, rel))
        groups[b] = files
    tbl = SimpleNamespace(_snapshot={"file_sizes": file_sizes}, path=tmp_root)
    return tbl, groups


@given(
    sizes=st.lists(
        st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=4),
        min_size=1,
        max_size=24,
    ),
    nb=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_pack_aligned_lpt_bound_and_determinism(sizes, nb):
    by_bucket = {b: szs for b, szs in enumerate(sizes)}
    tbl, groups = _fake_table("/nonexistent-root", by_bucket)
    ids = sorted(groups)
    slots = _pack_aligned(ids, [groups], [tbl], nb)
    # partition: every bucket exactly once
    flat = [b for s in slots for b in s]
    assert sorted(flat) == ids
    assert len(slots) <= nb

    def w(b):
        return manifest_file_bytes(
            tbl._snapshot["file_sizes"], tbl.path, groups[b]
        )

    weights = {b: w(b) for b in ids}
    total = sum(weights.values())
    max_item = max(weights.values())
    max_slot = max(sum(weights[b] for b in s) for s in slots)
    # greedy bound (exact arithmetic: ceil division via integer math)
    assert max_slot <= -(-total // nb) + max_item
    # deterministic
    assert _pack_aligned(ids, [groups], [tbl], nb) == slots


def test_manifest_file_bytes_missing_file_is_zero(tmpdir_path):
    # unregistered AND non-existent file: counted as 0, no raise
    assert (
        manifest_file_bytes({}, tmpdir_path, [os.path.join(tmpdir_path, "nope")]) == 0
    )
    # registered file: manifest wins even if the file is absent on disk
    sizes = {"a.parquet": 123}
    assert (
        manifest_file_bytes(sizes, tmpdir_path, [os.path.join(tmpdir_path, "a.parquet")])
        == 123
    )

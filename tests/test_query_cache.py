"""ADVICE r4: memoized work-table paths must be validated on lookup (a
tmpdir removed externally must trigger a rebuild, not a dangling-path
error) and registered for end-of-process cleanup."""

from __future__ import annotations

import os
import shutil

from mas_scada_bulkingest_spark import cdc_queries as cq


def test_cache_lookup_valid_path(tmpdir_path):
    cache = {"k": tmpdir_path}
    assert cq._cache_lookup(cache, "k") == tmpdir_path
    assert "k" in cache


def test_cache_lookup_evicts_dangling_path(tmpdir_path):
    gone = os.path.join(tmpdir_path, "sub")
    os.makedirs(gone)
    cache = {"k": gone}
    shutil.rmtree(gone)
    assert cq._cache_lookup(cache, "k") is None
    assert "k" not in cache  # evicted → caller rebuilds


def test_cache_lookup_tuple_values(tmpdir_path):
    a = os.path.join(tmpdir_path, "a")
    b = os.path.join(tmpdir_path, "b")
    os.makedirs(a)
    os.makedirs(b)
    cache = {"k": (a, b), "m": (a, {"totals": 1})}
    assert cq._cache_lookup(cache, "k") == (a, b)
    # non-path tuple members (e.g. a totals dict) are ignored
    assert cq._cache_lookup(cache, "m") == (a, {"totals": 1})
    shutil.rmtree(b)
    assert cq._cache_lookup(cache, "k") is None


def test_workdirs_registered_for_cleanup():
    d = cq._workdir("msbs-cache-test-")
    try:
        assert os.path.isdir(d)
        assert d in cq._WORKDIRS  # atexit hook will rmtree it
    finally:
        shutil.rmtree(d, ignore_errors=True)

"""Edge-semantics tests for cross-corpus chunk dedup and the deterministic
corpus split (the oracle entries prove bulk parity; these pin the boundary
rules on rows where the expected answer is readable)."""

from __future__ import annotations

import hashlib

from mas_scada_bulkingest_spark.queries import (
    _CHUNK_W,
    _SPLIT_BOUNDS,
    q_corpus_split,
    q_dedup_chunks,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _chunk(prefix: str) -> str:
    """One full chunk of _CHUNK_W distinct words."""
    return " ".join(f"{prefix}{i}" for i in range(_CHUNK_W))


def _write_docs(spark, tmpdir_path, texts: list[str]) -> None:
    rows = [
        (i, t, "en" if i % 2 == 0 else "de", "src", len(t))
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmpdir_path}/documents.parquet")


def test_dedup_chunks_first_global_occurrence_wins(spark, tmpdir_path):
    c1, c2, u = _chunk("a"), _chunk("b"), _chunk("u")
    texts = [
        f"{c1} {c2}",  # doc 0: both chunks first occurrences -> all kept
        f"{c2} {u}",   # doc 1: c2 already seen at (0,1) -> only u survives
        f"{c1} {c1}",  # doc 2: both copies lose to (0,0) -> nothing kept
    ]
    _write_docs(spark, tmpdir_path, texts)
    rows = {r["doc_id"]: r for r in q_dedup_chunks(spark, tmpdir_path).collect()}
    assert rows[0]["n_chunks"] == 2 and rows[0]["n_kept"] == 2
    assert rows[0]["clean_fp"] == _md5(f"{c1} {c2}")
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 1
    assert rows[1]["clean_fp"] == _md5(u)
    # a document whose every chunk is a duplicate keeps nothing: NULL fp,
    # not md5('') — the reassembled-empty and the never-reassembled cases
    # must be distinguishable downstream
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 0
    assert rows[2]["clean_fp"] is None


def test_dedup_chunks_within_doc_repeat_and_partial_tail(spark, tmpdir_path):
    z, f = _chunk("z"), _chunk("f")
    tail = "p0 p1"  # a 2-word trailing partial chunk
    texts = [
        f"{z} {z}",        # within-doc repeat: dedup is global, 2nd copy drops
        f"{f} {tail}",     # word count not a multiple of W: tail is a chunk
    ]
    _write_docs(spark, tmpdir_path, texts)
    rows = {r["doc_id"]: r for r in q_dedup_chunks(spark, tmpdir_path).collect()}
    assert rows[0]["n_chunks"] == 2 and rows[0]["n_kept"] == 1
    assert rows[0]["clean_fp"] == _md5(z)
    # all chunks unique -> reassembly in chunk order reproduces the input
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 2
    assert rows[1]["clean_fp"] == _md5(f"{f} {tail}")


def _expected_split(doc_id: int) -> str:
    h2 = _md5(f"split:{doc_id}")[:2]
    if h2 < format(_SPLIT_BOUNDS["train"], "02x"):
        return "train"
    if h2 < format(_SPLIT_BOUNDS["valid"], "02x"):
        return "valid"
    return "test"


def test_corpus_split_membership_is_engine_independent(spark, tmpdir_path):
    # 60 docs of 3 tokens each; expected profile recomputed independently
    # in pure Python from the same md5 rule — membership must be a function
    # of the document alone, never of partitioning or scan order
    n = 60
    _write_docs(spark, tmpdir_path, ["tok tok tok"] * n)
    rows = {r["split"]: r for r in q_corpus_split(spark, tmpdir_path).collect()}
    expected: dict[str, list[int]] = {}
    for i in range(n):
        expected.setdefault(_expected_split(i), []).append(i)
    assert set(rows) == set(expected)
    for split, ids in expected.items():
        r = rows[split]
        assert r["n_docs"] == len(ids)
        assert r["sum_tokens"] == 3 * len(ids)
        assert r["min_doc_id"] == min(ids) and r["max_doc_id"] == max(ids)
    # the three splits partition the corpus exactly
    assert sum(r["n_docs"] for r in rows.values()) == n

"""Edge-semantics tests for benchmark decontamination and repetition
scoring (the oracle entries prove bulk parity at sf0.01/sf0.1; these pin
the boundary rules on rows where the expected answer is readable)."""

from __future__ import annotations

from mas_scada_bulkingest_spark.queries import (
    _DECON_EVAL_MOD,
    _DECON_K,
    q_decontaminate,
    q_text_repetition,
)


def _write_docs(spark, rows, tmpdir_path):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmpdir_path}/documents.parquet")
    return tmpdir_path


def _doc(doc_id, text):
    return (doc_id, text, "en", "s", len(text))


def test_decontaminate_flags_exact_kgram_overlap(spark, tmpdir_path):
    assert _DECON_K == 4 and _DECON_EVAL_MOD == 23  # constants the rows encode
    d = _write_docs(
        spark,
        [
            _doc(0, "w1 w2 w3 w4 w5"),           # eval (0 % 23 == 0)
            _doc(46, "w2 w3 w4 w5 w6"),          # eval (46 % 23 == 0)
            _doc(1, "x w1 w2 w3 w4"),            # shares 1 shingle with eval 0
            _doc(2, "a b c d e"),                # clean
            _doc(3, "w1 w2 w3 w4 w5 w6"),        # shares with BOTH eval docs
            _doc(4, "a b c"),                    # too short for a 4-gram
        ],
        tmpdir_path,
    )
    got = {r["doc_id"]: r for r in q_decontaminate(spark, d).collect()}
    assert set(got) == {1, 3}  # eval docs and clean docs never appear
    assert (got[1]["n_hit_shingles"], got[1]["n_eval_docs"]) == (1, 1)
    # doc 3's shingles: "w1 w2 w3 w4", "w2 w3 w4 w5" (both in eval 0; the
    # second also in eval 46), "w3 w4 w5 w6" (eval 46) -> 3 hits, 2 evals
    assert (got[3]["n_hit_shingles"], got[3]["n_eval_docs"]) == (3, 2)


def test_decontaminate_broadcasts_the_eval_side(spark, tmpdir_path):
    d = _write_docs(
        spark,
        [_doc(0, "w1 w2 w3 w4 w5"), _doc(1, "x w1 w2 w3 w4")],
        tmpdir_path,
    )
    out = q_decontaminate(spark, d)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the training corpus must stream through a broadcast hash join — a
    # SortMergeJoin here means the 100-TB side got shuffled by shingle
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_ratios_and_flag(spark, tmpdir_path):
    long_clean = " ".join(f"t{i}" for i in range(12))
    d = _write_docs(
        spark,
        [
            _doc(1, "a a a a"),     # degenerate repetition
            _doc(2, long_clean),    # 12 distinct tokens, all bigrams unique
            _doc(3, "solo"),        # 1 token -> no bigram -> excluded
        ],
        tmpdir_path,
    )
    got = {r["doc_id"]: r for r in q_text_repetition(spark, d).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_tokens"] == 4
    assert r1["distinct_ratio"] == 0.25      # 1 distinct / 4 -> < 0.3
    assert r1["top_token_ratio"] == 1.0
    assert r1["top_bigram_ratio"] == 1.0     # "a a" is all 3 bigrams
    assert r1["flag_repetitive"] is True
    r2 = got[2]
    assert r2["distinct_ratio"] == 1.0
    assert round(r2["top_bigram_ratio"], 4) == round(1 / 11, 4)  # <= 0.18
    assert r2["flag_repetitive"] is False


def _wtext(n):
    return " ".join(["w"] * n)


def test_pack_sequences_boundary_and_overrun(spark, tmpdir_path):
    from mas_scada_bulkingest_spark.queries import _PACK_CTX, q_pack_sequences

    assert _PACK_CTX == 512
    d = _write_docs(
        spark,
        [
            # shard A: 500 + 12 fills pack 0 exactly; next doc starts at 512
            (1, _wtext(500), "en", "srcA", 0),
            (2, _wtext(12), "en", "srcA", 0),
            (3, _wtext(1), "en", "srcA", 0),
            # shard B: an oversized doc overruns pack 0 alone; the next doc
            # starts at offset 600 -> pack 1 (document-atomic overrun rule)
            (10, _wtext(600), "en", "srcB", 0),
            (11, _wtext(5), "en", "srcB", 0),
        ],
        tmpdir_path,
    )
    got = {
        (r["source"], r["pack_id"]): r
        for r in q_pack_sequences(spark, d).collect()
    }
    assert set(got) == {("srcA", 0), ("srcA", 1), ("srcB", 0), ("srcB", 1)}
    a0 = got[("srcA", 0)]
    assert (a0["n_docs"], a0["n_tokens"], a0["fill_ratio"]) == (2, 512, 1.0)
    a1 = got[("srcA", 1)]
    assert (a1["n_docs"], a1["n_tokens"], a1["first_doc_id"]) == (1, 1, 3)
    b0 = got[("srcB", 0)]
    assert (b0["n_docs"], b0["n_tokens"]) == (1, 600)  # atomic overrun
    assert got[("srcB", 1)]["first_doc_id"] == 11


def test_redact_pii_injection_counts_and_bytes(spark, tmpdir_path):
    import hashlib

    from mas_scada_bulkingest_spark.queries import q_redact_pii

    d = _write_docs(
        spark,
        [
            # 105 hits every injection class: %5 (email), %7 (phone), %3 (IP)
            _doc(105, "base words"),
            # 1 matches no injection class and carries no PII -> clean
            _doc(1, "hello world"),
            # 2 matches no class but the TEXT already contains PII
            _doc(2, "mail bob@corp.io or 555-867-5309 ok"),
        ],
        tmpdir_path,
    )
    got = {r["doc_id"]: r for r in q_redact_pii(spark, d).collect()}

    r = got[105]  # 105 // 7 == 15 -> ip 10.0.105.15
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    assert r["n_redactions"] == 3 and r["is_clean"] is False
    expect = "base words reach <EMAIL> call <PHONE> from <IP>"
    assert r["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()

    r = got[1]
    assert r["n_redactions"] == 0 and r["is_clean"] is True
    assert (
        r["redacted_md5"] == hashlib.md5(b"hello world").hexdigest()
    )  # untouched text

    r = got[2]  # pre-existing PII is scrubbed even with no injection
    assert (r["n_emails"], r["n_phones"]) == (1, 1)
    expect = "mail <EMAIL> or <PHONE> ok"
    assert r["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()

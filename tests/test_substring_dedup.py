"""ExactSubstr-style duplicated-span dedup (operators/dedup.substring_spans).

Pins the span-merge clamp semantics — ``sum(min(k, pos - prev))`` with the
first duplicated position contributing ``k`` — on a handcrafted corpus where
coverage is PARTIAL (the parquet fixtures are template-copies, so their
dup_frac is degenerately 0 or 1 and would not catch a clamp bug), plus the
hashed-key scale path's exact equivalence to the string-key plan.
"""

from __future__ import annotations

from osm_poi_matchmaker_spark.operators import dedup


def _mk_docs(spark):
    rows = [
        # within-doc repeat: "w1 w2 w3 w4 w5" at token offsets 0 and 7
        # (k=4 -> dup windows at pos 0,1,7,8; coverage 4+1+4+1 = 10 of 12)
        (1, "w1 w2 w3 w4 w5 x1 x2 w1 w2 w3 w4 w5"),
        # all-unique tokens: zero dup windows
        (2, "u1 u2 u3 u4 u5 u6 u7 u8"),
        # cross-doc shared 4-token run "s1 s2 s3 s4" (one window each)
        (3, "s1 s2 s3 s4 a1 a2 a3"),
        (4, "b1 b2 b3 s1 s2 s3 s4"),
        # shorter than k: no windows at all
        (5, "t1 t2 t3"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_partial_coverage_clamp(spark):
    out = {
        r["doc_id"]: r
        for r in dedup.substring_spans(_mk_docs(spark), k=4, flag_frac=0.5).collect()
    }
    assert out[1]["n_dup_windows"] == 4
    assert out[1]["dup_span_tokens"] == 10
    assert abs(out[1]["dup_frac"] - round(10 / 12, 6)) < 1e-9
    assert out[1]["is_substring_dup"] is True

    assert out[2]["n_dup_windows"] == 0
    assert out[2]["dup_span_tokens"] == 0
    assert out[2]["is_substring_dup"] is False

    for d in (3, 4):
        assert out[d]["n_dup_windows"] == 1
        assert out[d]["dup_span_tokens"] == 4
        assert out[d]["is_substring_dup"] is (4 / 7 >= 0.5)

    assert out[5]["n_tokens"] == 3
    assert out[5]["n_dup_windows"] == 0
    assert out[5]["dup_frac"] == 0.0


def test_hashed_key_is_equivalent(spark):
    docs = _mk_docs(spark)
    a = sorted(map(tuple, dedup.substring_spans(docs, k=4).collect()))
    b = sorted(map(tuple, dedup.substring_spans(docs, k=4, hashed=True).collect()))
    assert a == b


def test_case_insensitive_windows(spark):
    docs = spark.createDataFrame(
        [(1, "Foo Bar Baz Qux tail1"), (2, "foo bar baz qux tail2")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in dedup.substring_spans(docs, k=4).collect()
    }
    assert out[1]["n_dup_windows"] == 1 and out[2]["n_dup_windows"] == 1


def test_rewrite_removes_covered_spans(spark):
    out = {
        r["doc_id"]: r
        for r in dedup.substring_rewrite(_mk_docs(spark), k=4).collect()
    }
    # doc 1: covered idx = [0,3]∪[1,4]∪[7,10]∪[8,11] → 0..4 and 7..11
    # kept: idx 5 ('x1') and 6 ('x2')
    assert out[1]["n_removed"] == 10
    assert out[1]["text_rewritten"] == "x1 x2"
    # doc 2 untouched (lowercased by design)
    assert out[2]["n_removed"] == 0
    assert out[2]["text_rewritten"] == "u1 u2 u3 u4 u5 u6 u7 u8"
    # docs 3/4: the shared 4-token run goes, tails stay in order
    assert out[3]["text_rewritten"] == "a1 a2 a3"
    assert out[4]["text_rewritten"] == "b1 b2 b3"
    # doc 5 (< k tokens): no windows, fully kept
    assert out[5]["n_removed"] == 0
    assert out[5]["text_rewritten"] == "t1 t2 t3"


def test_rewrite_fully_duplicated_doc_empties(spark):
    docs = spark.createDataFrame(
        [(1, "c1 c2 c3 c4"), (2, "c1 c2 c3 c4")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in dedup.substring_rewrite(docs, k=4).collect()}
    for d in (1, 2):
        assert out[d]["n_removed"] == 4
        assert out[d]["text_rewritten"] == ""


def test_lsh_index_probe_one_sided(spark):
    """Batch docs near-dup of a corpus doc are flagged with the MIN
    matching corpus id; batch-only near-dup families are NOT flagged
    (intra-batch policy belongs to lsh_arrival_dedup)."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "the quick brown fox jumps over the lazy dog today"),
            (12, "completely unrelated corpus text about spark plans"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "novel batch document with fresh tokens nobody indexed"),
            (3, "novel batch document with fresh tokens nobody indexed"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.lsh_index_probe(corpus, batch).collect()
    }
    assert out[1]["is_known_dup"] is True and out[1]["matched_id"] == 10
    # docs 2/3 duplicate each other but match nothing in the corpus
    assert out[2]["is_known_dup"] is False and out[2]["matched_id"] is None
    assert out[3]["is_known_dup"] is False

    # consistency with the symmetric pair op: a flagged batch doc must
    # appear in minhash_lsh_pairs over corpus ∪ batch with its match
    pairs = dedup.minhash_lsh_pairs(corpus.unionByName(batch)).collect()
    assert any({p["doc_a"], p["doc_b"]} == {1, 10} for p in pairs)

"""quality.bigram_lm_score: exact values vs a straight-line Python
recompute of the add-one bigram LM, plus edge semantics (short docs)."""

from __future__ import annotations

import math

from osm_poi_matchmaker_spark.operators.quality import bigram_lm_score


def _lm_py(corpus):
    toks = {d: t.split() for d, t in corpus}
    uni: dict[str, int] = {}
    bic: dict[tuple[str, str], int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bic[(a, b)] = bic.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        s = 0.0
        for a, b in zip(t, t[1:]):
            s += math.log((bic[(a, b)] + 1.0) / (uni[a] + v))
        n = len(t) - 1
        out[d] = (n, round(s / n, 6), round(math.exp(-(s / n)), 6))
    return out


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the cat"),
    (3, "zq"),  # single token -> no bigrams -> absent
    (4, "the the the the"),
    (5, "dog runs fast"),
]


def test_lm_score_matches_python(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["perplexity"])
        for r in bigram_lm_score(docs).collect()
    }
    assert got == _lm_py(CORPUS)


def test_lm_score_ranks_fluency(spark):
    # a doc made of corpus-frequent bigrams must score better (higher
    # avg_logp, lower perplexity) than a doc of one-off bigrams
    rows = [(i, "a b c a b c a b c") for i in range(10)] + [(100, "x y z w q r")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert got[0]["avg_logp"] > got[100]["avg_logp"]
    assert got[0]["perplexity"] < got[100]["perplexity"]


def test_vocab_topk_counts_and_ties(spark):
    from osm_poi_matchmaker_spark.operators.quality import vocab_topk

    docs = spark.createDataFrame(
        [(1, "b a b c"), (2, "a b z"), (3, "c a")], "doc_id long, text string"
    )
    rows = vocab_topk(docs, k=3).collect()
    got = [(r["term"], r["freq"], r["df"], r["rank"]) for r in rows]
    got.sort(key=lambda x: x[3])
    # a and b tie at freq 3 -> term-asc breaks the tie; c (freq 2) third
    assert got == [("a", 3, 3, 1), ("b", 3, 2, 2), ("c", 2, 2, 3)]


def test_corpus_gate_rule_order(spark):
    from osm_poi_matchmaker_spark.operators.quality import corpus_gate

    rows = [
        # short AND repetitive -> too_short wins (first failing rule)
        (1, "a a a a a"),
        # long + repetitive (one token dominates > 10%)
        (2, " ".join(["spam"] * 10 + [f"w{i}" for i in range(20)])),
        # long, diverse -> keep (or high_perplexity; must not be short/rep)
        (3, " ".join(f"t{i} u{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in corpus_gate(docs).collect()}
    assert got[1]["reason"] == "too_short" and not got[1]["keep"]
    assert got[2]["reason"] == "repetitive" and not got[2]["keep"]
    assert got[3]["reason"] in ("keep", "high_perplexity")
    assert got[3]["keep"] == (got[3]["reason"] == "keep")

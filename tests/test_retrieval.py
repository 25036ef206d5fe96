"""BM25 retrieval: exact scores vs a straight-line Python recompute, rank
ordering properties, and the broadcast-filter plan shape."""

from __future__ import annotations

import math

from osm_poi_matchmaker_spark.operators.retrieval import bm25_topk


def _bm25_py(corpus, queries, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        terms = list(dict.fromkeys(qtext.split()))
        for doc, t in toks.items():
            score = 0.0
            # term-order fold, like the operator
            for term in sorted(terms):
                tf = t.count(term)
                if not tf:
                    continue
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                score += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(t) / avgdl)
                )
            if score:
                out[(qid, doc)] = round(score, 6)
    return out


CORPUS = [
    (1, "spark join spark join spark"),
    (2, "spark filter scan"),
    (3, "join join table scan fast fast fast"),
    (4, "window order by value"),
    (5, "table scan table scan table scan"),
]
QUERIES = [(10, "spark join"), (11, "table scan fast")]


def test_bm25_matches_python_recompute(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_topk(docs, QUERIES, k=10).collect()
    }
    assert got == _bm25_py(CORPUS, QUERIES)


def test_bm25_rank_orders_by_relevance(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = bm25_topk(docs, QUERIES, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["bm25"]))
    for q, rs in by_q.items():
        rs.sort()
        scores = [s for _, _, s in rs]
        assert scores == sorted(scores, reverse=True)
        assert [r for r, _, _ in rs] == list(range(1, len(rs) + 1))
    # doc 1 (spark x3, join x2) must beat doc 2 (spark x1) on "spark join"
    q10 = {d: r for r, d, _ in by_q[10]}
    assert q10[1] < q10[2]


def test_bm25_k_cut_and_plan(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    df = bm25_topk(docs, QUERIES, k=1)
    rows = df.collect()
    assert sorted(r["query_id"] for r in rows) == [10, 11]
    assert all(r["rank"] == 1 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the query-term restriction must be a broadcast hash join, so the
    # corpus-side postings for non-query terms never shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_plan_query_side_broadcast(spark):
    from osm_poi_matchmaker_spark.operators.retrieval import tfidf_topk

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    df = tfidf_topk(docs, QUERIES, k=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scoring joins only query-term postings (broadcast the tiny query
    # weights); the only wide shapes are the postings aggregations
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_matches_python_recompute(spark):
    import math

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    from osm_poi_matchmaker_spark.operators.retrieval import tfidf_topk

    got = {
        (r.query_id, r.doc_id): r.tfidf_cosine
        for r in tfidf_topk(docs, QUERIES, k=5).collect()
    }
    corpus = {d: t.split() for d, t in CORPUS}
    n = len(corpus)
    from collections import Counter
    df_t = Counter()
    for toks in corpus.values():
        for t in set(toks):
            df_t[t] += 1
    def idf(t):
        return math.log((n + 1.0) / (df_t.get(t, 0) + 1.0)) + 1.0
    w = {
        d: {t: c * idf(t) for t, c in Counter(toks).items()}
        for d, toks in corpus.items()
    }
    dnorm = {d: math.sqrt(sum(x * x for _, x in sorted(ws.items()))) for d, ws in w.items()}
    for (qid, qtext) in QUERIES:
        qts = list(dict.fromkeys(qtext.split()))
        qw = {t: idf(t) for t in qts}
        qn = math.sqrt(sum(qw[t] * qw[t] for t in sorted(qw)))
        for d, ws in w.items():
            dot = sum(ws[t] * qw[t] for t in sorted(qw) if t in ws)
            if dot == 0.0:
                continue
            expect = round(dot / (dnorm[d] * qn), 6)
            if (qid, d) in got:
                assert abs(got[(qid, d)] - expect) < 1e-6, (qid, d)

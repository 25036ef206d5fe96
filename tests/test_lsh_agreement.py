"""dedup.lsh_agreement unit tests: the three statuses on a corpus built
to force each (identical docs -> hit; a true near-dup pair whose banding
collides only if every band matches -> missed is possible; band
collisions below the Jaccard threshold -> extra)."""

from osm_poi_matchmaker_spark.operators.dedup import (
    lsh_agreement,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_are_hits(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "one two three four five six"),
        ],
    )
    got = {(r["doc_a"], r["doc_b"]): r["status"] for r in lsh_agreement(docs).collect()}
    assert got[(1, 2)] == "hit"
    assert (1, 3) not in got and (2, 3) not in got


def test_agreement_partitions_the_union(spark):
    # statuses must exactly partition truth ∪ candidates for any corpus
    rows = [(i, " ".join(f"w{(i * j) % 23}" for j in range(1, 12))) for i in range(40)]
    rows += [(100 + i, "shared prefix tokens here plus tail %d" % i) for i in range(6)]
    docs = _docs(spark, rows)
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    ag = {(r["doc_a"], r["doc_b"]): r["status"] for r in lsh_agreement(docs).collect()}
    assert set(ag) == truth | cand
    assert {p for p, s in ag.items() if s == "hit"} == truth & cand
    assert {p for p, s in ag.items() if s == "missed"} == truth - cand
    assert {p for p, s in ag.items() if s == "extra"} == cand - truth


def test_ann_recall_bounds_and_exact_self(spark):
    from osm_poi_matchmaker_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, match_id long"
    )
    # approx hits 1 of 2 for query 1, both for query 2
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id long, match_id long"
    )
    got = {r["query_id"]: r for r in ann_recall(exact, approx, "x").collect()}
    assert got[1]["recall"] == 0.5 and got[1]["n_hits"] == 1
    assert got[2]["recall"] == 1.0 and got[2]["n_hits"] == 2
    # recall of exact vs itself is 1 everywhere
    self_r = ann_recall(exact, exact, "self").collect()
    assert all(r["recall"] == 1.0 for r in self_r)

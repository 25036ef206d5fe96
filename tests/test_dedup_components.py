"""connected_components / dedup_components unit tests.

The oracle-parity sweep pins the MinHash-fed end-to-end result; these pin
the graph algorithm itself on adversarial shapes (long chains need the
pointer-jumping step to converge in O(log n) rounds, not O(n))."""

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.dedup import (
    connected_components,
    dedup_components,
    dedup_keep_best,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_components_disjoint_and_transitive(spark):
    # {1,2,3} via chain, {10,11} direct, 99 absent from any pair
    pairs = _pairs(spark, [(2, 1), (2, 3), (10, 11)])
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    # a 300-node path: min-label propagation alone needs ~300 rounds;
    # pointer jumping must close it within the default max_iter=25.
    # driver_guard_edges=0 forces the DISTRIBUTED loop (the default
    # guard would fold a graph this small on the driver).
    n = 300
    pairs = _pairs(spark, [(i, i + 1) for i in range(n)])
    comp = connected_components(pairs, driver_guard_edges=0)
    assert comp.select(F.countDistinct("component")).collect()[0][0] == 1
    assert comp.count() == n + 1
    assert comp.agg(F.min("component"), F.max("component")).collect()[0] == (0, 0)


def test_guarded_and_distributed_paths_identical(spark):
    # chains + a star + an isolated pair, labels must agree exactly
    edges = (
        [(i, i + 1) for i in range(40)]
        + [(1000, 1000 + j) for j in range(1, 15)]
        + [(5000, 5001)]
    )
    pairs = _pairs(spark, edges)
    fast = {r["node"]: r["component"]
            for r in connected_components(pairs).collect()}
    dist = {r["node"]: r["component"]
            for r in connected_components(pairs, driver_guard_edges=0).collect()}
    assert fast == dist


def test_dedup_components_covers_all_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = _pairs(spark, [(0, 3), (3, 5)])
    rows = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
            for r in dedup_components(docs, pairs).collect()}
    assert rows == {
        0: (0, False), 1: (1, False), 2: (2, False),
        3: (0, True), 4: (4, False), 5: (0, True),
    }


def test_dedup_keep_best_longest_wins(spark):
    """Canonical = longest text in the component; ties break to the
    smallest doc_id; unpaired docs are their own canonical."""
    docs = spark.createDataFrame(
        [(0, "aa"), (1, "bbbb"), (2, "cc"), (3, "dd"), (4, "ee"), (5, "ff")],
        "doc_id long, text string",
    )
    # component {0,1,2}: doc 1 has the longest text -> canonical
    # component {3,5}: equal lengths -> min id 3 wins; 4 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 5)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
            for r in dedup_keep_best(docs, pairs).collect()}
    assert rows == {
        0: (1, True), 1: (1, False), 2: (1, True),
        3: (3, False), 4: (4, False), 5: (3, True),
    }


def test_decontaminate_flags_shared_ngrams(spark):
    """A doc sharing an n-gram with a benchmark doc is contaminated
    (including a benchmark member present in the corpus); others clean.
    hit_shingles counts distinct leaked n-grams; min_bench_id points at
    the lowest colliding benchmark doc."""
    from osm_poi_matchmaker_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),     # shares 'a b c' and 'b c d' with bench 10
            (1, "x y z w v"),     # clean
            (2, "q q a b c d q"), # shares 'a b c' and 'b c d'
            (3, "a b x c d"),     # no full trigram overlap -> clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "a b c d"), (11, "b c d zz")], "bench_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["contaminated"], r["hit_shingles"], r["min_bench_id"])
        for r in decontaminate(docs, bench, n=3).collect()
    }
    assert rows == {
        0: (True, 2, 10),   # 'a b c' (bench 10) + 'b c d' (bench 10 and 11)
        1: (False, 0, None),
        2: (True, 2, 10),
        3: (False, 0, None),
    }

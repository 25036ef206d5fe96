"""pagerank: integer-exact recurrence vs an independent Fraction oracle."""

from fractions import Fraction
from math import lcm

import pytest

from osm_poi_matchmaker_spark.operators.linkgraph import pagerank


def _frac_pagerank(weights, edges, iterations, damping=Fraction(17, 20)):
    """Straightforward rational PageRank (the textbook recurrence)."""
    n = len(weights)
    w = sum(weights.values())
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: Fraction(weights[v], w) for v in weights}
    for _ in range(iterations):
        nxt = {v: (1 - damping) / n for v in weights}
        for s, d in edges:
            nxt[d] += damping * r[s] / outdeg[s]
        r = nxt
    return r


GRAPH = {
    # mixed out-degrees (2 and 3 -> L=6), a dangling node (e), a
    # no-in-edge node (f), weighted starts
    "weights": {"a": 5, "b": 1, "c": 3, "d": 2, "e": 4, "f": 1},
    "edges": [
        ("a", "b"),
        ("a", "c"),
        ("b", "c"),
        ("b", "d"),
        ("b", "a"),
        ("c", "a"),
        ("c", "d"),
        ("d", "a"),
        ("d", "b"),
        ("f", "a"),
        ("f", "e"),
    ],
}


def test_pagerank_matches_rational_oracle(spark):
    nodes = spark.createDataFrame(
        [(k, v) for k, v in GRAPH["weights"].items()], "node string, weight long"
    )
    edges = spark.createDataFrame(GRAPH["edges"], "src string, dst string")
    got = {r["node"]: r for r in pagerank(nodes, edges, iterations=4).collect()}

    ref = _frac_pagerank(GRAPH["weights"], GRAPH["edges"], 4)
    n, w = 6, sum(GRAPH["weights"].values())
    degs = lcm(2, 3)
    unit = n * w * (20 * degs) ** 4
    for v, frac in ref.items():
        # the scaled rational is integral by construction — that's the
        # exactness claim
        scaled = frac * unit
        assert scaled.denominator == 1
        assert got[v]["rank_num"] == scaled.numerator
        assert got[v]["rank_unit"] == unit
        assert got[v]["rank_frac"] == pytest.approx(float(frac), abs=0, rel=1e-15)


def test_pagerank_mass_conservation_no_dangling(spark):
    # a 3-cycle with uniform weights: total mass is exactly the unit
    nodes = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], "node string, weight long"
    )
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    out = pagerank(nodes, edges, iterations=3).collect()
    unit = out[0]["rank_unit"]
    assert sum(r["rank_num"] for r in out) == unit
    # symmetric graph + uniform start => uniform ranks
    assert len({r["rank_num"] for r in out}) == 1


def test_pagerank_overflow_guard(spark):
    nodes = spark.createDataFrame([("a", 1), ("b", 1)], "node string, weight long")
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    with pytest.raises(OverflowError):
        pagerank(nodes, edges, iterations=16)

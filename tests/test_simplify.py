"""Douglas-Peucker way simplification (operators/ways.simplify_ways).

The sf ways are 2-5 nodes (recursion depth <= 2); these tests drive the
DEEP recursion on synthetic long polylines against an independent pure-
Python DP, with coordinates as pure functions of the node id (the module
convention), exercising unbalanced splits, all-dropped, and all-kept.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

_KY = 111194.9267
_KX0 = 111319.4908

# Synthetic long polylines: node id n encodes (way, idx) as way*1000+idx;
# latitude walks north ~61 m/idx, longitude wiggles with a way-phased sine
# (quasi-period ~7 vertices: split depth ~8, splits still uneven).
N_IDX = 24


def _lat(way: int, idx: int) -> float:
    return 46.0 + way * 0.01 + idx * 0.00055


def _lon(way: int, idx: int) -> float:
    return 17.0 + way * 0.01 + math.sin(idx * 0.9 + way) * 0.0012


def lat_of(nid):
    way = F.floor(nid / F.lit(1000)).cast("long")
    idx = (nid % 1000).cast("int")
    return (
        F.lit(46.0) + way.cast("double") * F.lit(0.01)
        + idx.cast("double") * F.lit(0.00055)
    )


def lon_of(nid):
    way = F.floor(nid / F.lit(1000)).cast("long")
    idx = (nid % 1000).cast("int")
    return (
        F.lit(17.0) + way.cast("double") * F.lit(0.01)
        + F.sin(idx.cast("double") * F.lit(0.9)
                + way.cast("double")) * F.lit(0.0012)
    )


def _seg_dist(way, k, i, j) -> float:
    plat, plon = _lat(way, k), _lon(way, k)
    kx = _KX0 * math.cos(math.radians(plat))
    ax, ay = (_lon(way, i) - plon) * kx, (_lat(way, i) - plat) * _KY
    bx, by = (_lon(way, j) - plon) * kx, (_lat(way, j) - plat) * _KY
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    t = max(0.0, min(1.0, -(ax * dx + ay * dy) / den)) if den > 0 else 0.0
    cx, cy = ax + t * dx, ay + t * dy
    return math.sqrt(cx * cx + cy * cy)


def _dp_ref(way: int, i: int, j: int, eps: float, kept: set) -> None:
    if j <= i + 1:
        return
    dev, negk = max((_seg_dist(way, k, i, j), -k) for k in range(i + 1, j))
    if dev > eps:
        k = -negk
        kept.add(k)
        _dp_ref(way, i, k, eps, kept)
        _dp_ref(way, k, j, eps, kept)


def _ways(spark, n_ways: int = 8):
    return spark.range(n_ways).select(
        F.col("id").alias("way_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(N_IDX - 1)),
            lambda i: F.col("id") * 1000 + i,
        ).alias("nodes"),
    )


@pytest.mark.parametrize("eps", [10.0, 30.0, 60.0, 500.0])
def test_dp_matches_pure_python(spark, eps):
    from osm_poi_matchmaker_spark.operators.ways import simplify_ways

    out = simplify_ways(_ways(spark), lat_of, lon_of, eps_m=eps)
    got = {}
    for r in out.collect():
        got.setdefault(r.way_id, set()).add(r.pos)
        assert r.node_id == r.way_id * 1000 + r.pos
    for way in range(8):
        kept = {0, N_IDX - 1}
        _dp_ref(way, 0, N_IDX - 1, eps, kept)
        assert got[way] == kept, (way, eps)


def test_dp_endpoints_always_kept_and_eps_monotone(spark):
    from osm_poi_matchmaker_spark.operators.ways import simplify_ways

    ways = _ways(spark, 6)
    prev = None
    for eps in (10.0, 30.0, 120.0):
        out = simplify_ways(ways, lat_of, lon_of, eps_m=eps)
        pd = out.toPandas()
        per_way = pd.groupby("way_id").pos.agg(["min", "max", "count"])
        assert (per_way["min"] == 0).all()
        assert (per_way["max"] == N_IDX - 1).all()
        if prev is not None:
            # larger eps never keeps more vertices
            assert (per_way["count"] <= prev["count"]).all()
        prev = per_way


def test_dp_degenerate_ways(spark):
    from osm_poi_matchmaker_spark.operators.ways import simplify_ways

    ways = spark.createDataFrame(
        [(1, [1001]), (2, [2001, 2002])], "way_id long, nodes array<long>"
    )
    out = simplify_ways(ways, lat_of, lon_of, eps_m=10.0).toPandas()
    got = sorted(map(tuple, out[["way_id", "pos"]].values.tolist()))
    assert got == [(1, 0), (2, 0), (2, 1)]


def test_dp_rejects_bad_eps(spark):
    from osm_poi_matchmaker_spark.operators.ways import simplify_ways

    with pytest.raises(ValueError):
        simplify_ways(_ways(spark, 1), lat_of, lon_of, eps_m=0.0)

"""Shuffle-degradation parity for the kNN family (round-3 verdict #1).

Every radius-bounded ring-join operator that previously hard-coded a
broadcast candidate side now takes ``broadcast_candidates=False`` — the
planet-scale path where a 10^8-row candidate table would blow the 8 GB
broadcast limit. Ring adjacency is symmetric, so moving the 9× explode
to the candidate side and letting the optimizer shuffle-join must pick
EXACTLY the same winners; these tests pin that, plus the plan shape
(no candidate broadcast, candidate-side ring generators), plus the
tiling guards ADVICE.md asked for (fine-cell stride aliasing,
marginal-radius loudness).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.interpolate import idw_interpolate
from osm_poi_matchmaker_spark.operators.knn import nearest_competitor, nearest_poi
from osm_poi_matchmaker_spark.operators.ways import nearest_way

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def no_auto_broadcast(spark):
    """Simulate planet-scale candidate stats: at sf0.001 the optimizer
    (correctly) auto-broadcasts tiny sides even without the hint, so the
    shuffle-plan property is only observable with auto-broadcast off."""
    thresholds = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k in thresholds:
            spark.conf.set(k, "-1")
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _rows(df, key_cols):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(t[: len(key_cols)]))


def test_nearest_poi_shuffle_identical(spark):
    pages = entry_mod._pages_geo(spark, SF)
    pois = synth.osm_pois(spark, SF)
    a = _rows(nearest_poi(pages, pois, 2000.0), ["page_id"])
    b = _rows(nearest_poi(pages, pois, 2000.0, broadcast_candidates=False), ["page_id"])
    assert a == b and len(a) > 0


def test_nearest_competitor_shuffle_identical(spark):
    pois = synth.osm_pois(spark, SF)
    a = _rows(nearest_competitor(pois, 2000.0), ["osm_id"])
    b = _rows(nearest_competitor(pois, 2000.0, broadcast_candidates=False), ["osm_id"])
    assert a == b and len(a) > 0


def test_nearest_way_shuffle_identical(spark):
    pages = entry_mod._pages_geo(spark, SF)
    ways = synth.ways_df(spark, SF)
    kw = dict(radius_m=2000.0, max_seg_m=160.0, mult=32)
    a = _rows(
        nearest_way(pages, ways, entry_mod._way_walk_lat, entry_mod._way_walk_lon, **kw),
        ["page_id"],
    )
    b = _rows(
        nearest_way(
            pages, ways, entry_mod._way_walk_lat, entry_mod._way_walk_lon,
            broadcast_candidates=False, **kw,
        ),
        ["page_id"],
    )
    assert a == b and len(a) > 0


def test_idw_shuffle_identical(spark):
    pages = entry_mod._pages_geo(spark, SF)
    sources = synth.osm_pois(spark, SF).select(
        (F.abs(F.col("osm_id")) % 97).cast("double").alias("value"), "lat", "lon"
    )
    a = _rows(idw_interpolate(pages, sources, 2000.0), ["page_id"])
    b = _rows(
        idw_interpolate(pages, sources, 2000.0, broadcast_candidates=False),
        ["page_id"],
    )
    assert len(a) == len(b) > 0
    # pair set identical → n_sources exact; est agrees up to FP summation order
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[1] == rb[1]
        assert ra[2] == pytest.approx(rb[2], rel=1e-9, abs=1e-9)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_knn_shuffle_plan_shape(spark):
    """Hint-free path: shuffle join, ring explode candidate-side only."""
    with no_auto_broadcast(spark):
        df = nearest_poi(
            entry_mod._pages_geo(spark, SF),
            synth.osm_pois(spark, SF),
            2000.0,
            broadcast_candidates=False,
        )
        plan = _plan_of(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    ring_lines = [l for l in plan.splitlines() if "explode(transform(" in l]
    assert ring_lines and all("cand_cell" in l for l in ring_lines), ring_lines
    assert not any("probe_cell" in l for l in ring_lines), ring_lines
    assert "BroadcastHashJoin" not in plan, plan


def test_knn_broadcast_plan_unchanged(spark):
    """Default path still broadcasts the candidate side (regression)."""
    df = nearest_poi(
        entry_mod._pages_geo(spark, SF), synth.osm_pois(spark, SF), 2000.0
    )
    assert "BroadcastHashJoin" in _plan_of(df)


# --- ADVICE.md tiling guards -------------------------------------------------


def test_fine_cell_no_longitude_aliasing(spark):
    """eps < ~154 m used to push the fine mult past the coarse X_SPAN
    stride, aliasing fine cells ~128° of longitude apart — two far-apart
    dense knots must NOT share a cluster."""
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        dbscan_clusters_contracted,
        fine_mult_for_eps,
    )

    mult = fine_mult_for_eps(100.0)
    assert mult >= 1024  # the regime where the old stride aliased
    # knot A near lon -120, knot B near lon 8.4375 (=-120+128.4375... pick
    # the exact aliasing offset of the OLD layout: dx_cells = k*X_SPAN).
    # With mult=2048 the old x-span aliased every 262144/2048 = 128° of
    # longitude. Place knots exactly 128° apart at the same latitude.
    rows = []
    for i in range(4):
        rows.append((100 + i, 40.0 + i * 1e-5, -120.0 + i * 1e-5))
        rows.append((200 + i, 40.0 + i * 1e-5, 8.0 + i * 1e-5))
    pts = spark.createDataFrame(rows, ["osm_id", "lat", "lon"])
    out = dbscan_clusters_contracted(pts, eps_m=100.0, min_pts=3).collect()
    by_id = {r["osm_id"]: r for r in out}
    ca = {by_id[100 + i]["cluster"] for i in range(4)}
    cb = {by_id[200 + i]["cluster"] for i in range(4)}
    assert ca == {100} and cb == {200}, out


def test_fine_mult_guards():
    from osm_poi_matchmaker_spark.operators.spatial_cluster import fine_mult_for_eps

    with pytest.raises(ValueError):
        fine_mult_for_eps(0.0)
    with pytest.raises(ValueError):
        fine_mult_for_eps(-5.0)
    with pytest.raises(ValueError):
        fine_mult_for_eps(0.1)  # sub-0.6 m cell diagonal: id-space overflow


def test_coarse_mult_marginal_radius_fails_loudly():
    from osm_poi_matchmaker_spark.tiling import coarse_mult_for_radius

    # safe at the HU extent default
    assert coarse_mult_for_radius(400.0) == 128
    # a radius that brushes the pitch at a higher latitude must raise
    with pytest.raises(ValueError):
        coarse_mult_for_radius(280.0, max_lat=60.0)  # pitch 287.6*cos60/cos48.6 ≈ 217 m
    with pytest.raises(ValueError):
        coarse_mult_for_radius(80000.0)  # exceeds mult=1 pitch
    with pytest.raises(ValueError):
        coarse_mult_for_radius(0.0)


def test_components_null_edges_dropped(spark):
    from osm_poi_matchmaker_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, None), (None, 5), (None, None), (3, 4)],
        "doc_a int, doc_b int",
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}

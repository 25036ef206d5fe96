"""Ray-cast PIP unit tests beyond the oracle's rectangles (concave ring,
boundary conventions, bbox pruning)."""

from __future__ import annotations

import numpy as np

from osm_poi_matchmaker_spark.operators.pip import (
    _ray_cast,
    parse_wkt_polygon,
    point_in_polygon,
)


def test_parse_wkt():
    ring = parse_wkt_polygon("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert ring.shape == (5, 2)
    assert ring[1].tolist() == [4.0, 0.0]


def test_square_inside_outside():
    ring = parse_wkt_polygon("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    px = np.array([2.0, 5.0, -1.0, 3.9])
    py = np.array([2.0, 2.0, 2.0, 3.9])
    assert _ray_cast(px, py, ring).tolist() == [True, False, False, True]


def test_concave_polygon():
    # U-shape: the notch (2,3) is OUTSIDE, arms are inside
    ring = parse_wkt_polygon(
        "POLYGON((0 0,4 0,4 4,3 4,3 1,1 1,1 4,0 4,0 0))"
    )
    px = np.array([0.5, 3.5, 2.0, 2.0])
    py = np.array([3.0, 3.0, 3.0, 0.5])
    assert _ray_cast(px, py, ring).tolist() == [True, True, False, True]


def test_point_in_polygon_first_match_and_miss(spark):
    # the fragment-join path end-to-end: overlapping region (1.5,1.5) →
    # minimal (order_key, poly_id) wins (7); outside every polygon → -1
    polys = spark.createDataFrame(
        [
            (7, "POLYGON((0 0,2 0,2 2,0 2,0 0))"),
            (9, "POLYGON((1 1,3 1,3 3,1 3,1 1))"),
        ],
        "poly_id int, way_wkt string",
    )
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.5, 2.5), (3, 1.5, 1.5), (4, 10.0, 10.0)],
        "page_id long, lat double, lon double",
    )
    out = {
        r["page_id"]: r["poly_id"]
        for r in point_in_polygon(pts, polys).collect()
    }
    assert out == {1: 7, 2: 9, 3: 7, 4: -1}


def test_point_in_polygon_shuffle_degradation_same_answers(spark):
    # broadcast_polygons=False (the huge-polygon-set path) must agree
    polys = spark.createDataFrame(
        [
            (7, "POLYGON((0 0,2 0,2 2,0 2,0 0))"),
            (9, "POLYGON((1 1,3 1,3 3,1 3,1 1))"),
        ],
        "poly_id int, way_wkt string",
    )
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.5, 2.5), (3, 1.5, 1.5), (4, 10.0, 10.0)],
        "page_id long, lat double, lon double",
    )
    a = point_in_polygon(pts, polys, broadcast_polygons=True).collect()
    b = point_in_polygon(pts, polys, broadcast_polygons=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

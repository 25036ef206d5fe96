"""Ray-cast PIP unit tests beyond the oracle's rectangles (concave ring,
boundary conventions, bbox pruning)."""

from __future__ import annotations

import numpy as np

from osm_poi_matchmaker_spark.operators.pip import (
    PolygonIndex,
    _ray_cast,
    parse_wkt_polygon,
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


def test_polygon_index_first_match_and_miss():
    idx = PolygonIndex(
        [
            (7, "POLYGON((0 0,2 0,2 2,0 2,0 0))"),
            (9, "POLYGON((1 1,3 1,3 3,1 3,1 1))"),
        ]
    )
    lon = np.array([0.5, 2.5, 1.5, 10.0])
    lat = np.array([0.5, 2.5, 1.5, 10.0])
    # overlapping region (1.5,1.5) → first polygon in row order wins (7)
    assert idx.locate(lon, lat).tolist() == [7, 9, 7, -1]

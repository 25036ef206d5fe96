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


# --- round-4: non-convex ray-cast districts --------------------------

def test_pip_district_notch_and_overlap_semantics(spark):
    """The L-shape notch is inside the district's bbox but OUTSIDE the
    district (a bbox check would misclassify it); the overlapping metro
    polygon wins there and ONLY there (ORDER BY name first-hit)."""
    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark import synth
    from osm_poi_matchmaker_spark.operators.pip import point_in_polygon
    from tests.conftest import SF_SMALL

    polys = synth.district_polygons_df(spark, SF_SMALL)
    # district 0 cell: x0=16.099995, y0=45.699995, w=1.36, h=0.58
    pts = spark.createDataFrame(
        [
            # SW quadrant: inside the L
            (0, 45.85, 16.4),
            # NE quadrant center: inside bbox, inside the NOTCH -> metro
            (1, 45.99, 17.1),
            # exactly on the L's arm (NW quadrant): inside the L
            (2, 46.2, 16.4),
            # outside the whole grid
            (3, 44.0, 10.0),
        ],
        ["page_id", "lat", "lon"],
    )
    got = {r["page_id"]: r["poly_id"]
           for r in point_in_polygon(pts, polys, order_by="name").collect()}
    assert got[0] == 0
    assert got[1] == 25  # metro wins ONLY in the notch
    assert got[2] == 0
    assert got[3] == -1


def test_district_polygons_are_nonconvex(spark):
    import numpy as np

    from osm_poi_matchmaker_spark import synth
    from osm_poi_matchmaker_spark.operators.pip import parse_wkt_polygon
    from tests.conftest import SF_SMALL

    rows = synth.district_polygons_df(spark, SF_SMALL).collect()
    assert len(rows) == 26
    for r in rows:
        ring = parse_wkt_polygon(r["way_wkt"])
        if r["name"] == "metro":
            assert len(ring) == 5
            continue
        assert len(ring) == 7  # 6 distinct vertices, closed
        # cross products of consecutive edges change sign -> non-convex
        e = np.diff(ring, axis=0)
        cross = e[:-1, 0] * e[1:, 1] - e[:-1, 1] * e[1:, 0]
        assert (cross > 0).any() and (cross < 0).any(), r["name"]


def test_pip_enclave_hole_semantics(spark):
    """A point in the donut's hole crosses BOTH rings (even-odd →
    outside the county) and resolves to the enclave polygon; ring
    points stay county; an outer-ring-only test would get every hole
    point wrong."""
    from osm_poi_matchmaker_spark import synth
    from osm_poi_matchmaker_spark.operators.pip import (
        parse_wkt_rings,
        point_in_polygon,
    )

    polys = synth.enclave_polygons_df(spark)
    county_wkt = polys.where("name = 'county'").collect()[0]["way_wkt"]
    assert len(parse_wkt_rings(county_wkt)) == 2  # outer + hole
    pts = spark.createDataFrame(
        [
            (0, 47.5, 19.0),    # Budapest-ish: inside the hole
            (1, 47.0, 17.6),    # county ring area
            (2, 45.0, 10.0),    # outside everything
            (3, 47.58, 19.15),  # another hole point
        ],
        ["page_id", "lat", "lon"],
    )
    got = {r["page_id"]: r["poly_id"]
           for r in point_in_polygon(pts, polys, order_by="name").collect()}
    assert got[0] == 1 and got[3] == 1  # enclave, NOT county
    assert got[1] == 0
    assert got[2] == -1


def test_polygon_geometry_rings_donut_exact(spark):
    """Donut area is EXACTLY outer minus hole (BIGINT shoelace), the
    enclave's area is exactly the hole, and the donut centroid shifts
    away from the removed mass."""
    from osm_poi_matchmaker_spark import synth
    from osm_poi_matchmaker_spark.operators.pip import (
        polygon_geometry,
        polygon_geometry_rings,
    )

    polys = synth.enclave_polygons_df(spark)
    g = {r["poly_id"]: r for r in polygon_geometry_rings(polys).collect()}
    outer_a2 = 2 * (2 * synth.DLON_E6) * (2 * synth.DLAT_E6)
    hole_a2 = 2 * (synth.DLON_E6 // 2) * (synth.DLAT_E6 // 2)
    assert g[0]["n_rings"] == 2 and g[0]["area2_e12"] == outer_a2 - hole_a2
    assert g[1]["n_rings"] == 1 and g[1]["area2_e12"] == hole_a2
    # hole is NE of the outer center -> county centroid moves SW of it
    assert g[0]["centroid_lon"] < g[1]["centroid_lon"]
    assert g[0]["centroid_lat"] < g[1]["centroid_lat"]
    # single-ring polygons: ring-aware and single-ring forms agree
    d = synth.district_polygons_df(spark, "/root/testdata/sf0.001")
    a = {r["poly_id"]: r for r in polygon_geometry(d).collect()}
    b = {r["poly_id"]: r for r in polygon_geometry_rings(d).collect()}
    for pid in a:
        assert a[pid]["area2_e12"] == b[pid]["area2_e12"]
        assert abs(a[pid]["centroid_lon"] - b[pid]["centroid_lon"]) < 1e-5
        assert abs(a[pid]["centroid_lat"] - b[pid]["centroid_lat"]) < 1e-5

"""Raster↔vector: the general PIP rasterizer must agree with the
closed-form rect rasterizer on rectangular layers, and the coverage join
must classify points exactly like a direct bbox test."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.raster import (
    coverage_join,
    rasterize_polygons,
    rasterize_rects,
)
from tests.conftest import SF_SMALL as SF

MULT = 32


def test_polygon_rasterizer_agrees_with_rect_closed_form(spark):
    polys = synth.postcode_polygons_df(spark, SF)
    rect_mask = {
        (r["cell_id"], r["poly_id"])
        for r in rasterize_rects(
            polys.select("poly_id", "lat_min", "lat_max", "lon_min", "lon_max"), MULT
        ).collect()
    }
    pip_mask = {
        (r["cell_id"], r["poly_id"])
        for r in rasterize_polygons(polys, MULT, wkt="way_wkt").collect()
    }
    assert len(rect_mask) > 1000
    # ray-cast edge semantics can differ from the closed-form range only
    # for centers exactly on a boundary — the synthetic grid has none
    assert pip_mask == rect_mask


def test_coverage_join_matches_direct_bbox(spark):
    from osm_poi_matchmaker_spark.extract.geotag import geotag_pages
    from osm_poi_matchmaker_spark.tiling import coarse_cell_id

    polys = synth.postcode_polygons_df(spark, SF)
    mask = rasterize_rects(
        polys.select("poly_id", "lat_min", "lat_max", "lon_min", "lon_max"), MULT
    )
    pts = (
        geotag_pages(synth.pages(spark, SF))
        .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select(
            "page_id",
            "lat",
            "lon",
            coarse_cell_id(F.col("lat"), F.col("lon"), MULT).alias("cell_id"),
        )
    )
    got = {
        r["page_id"]: (r["covered"], r["poly_id"])
        for r in coverage_join(pts, mask).collect()
    }
    # direct (un-rasterized) containment of each point's CELL CENTER — the
    # raster path answers coverage at cell granularity by construction
    m = float(MULT)
    centers = pts.select(
        "page_id",
        ((F.floor((F.col("lat") + 90.0) * m) + 0.5) / m - 90.0).alias("clat"),
        ((F.floor((F.col("lon") + 180.0) * m) + 0.5) / m - 180.0).alias("clon"),
    )
    direct = {
        r["page_id"]: r["poly_id"]
        for r in centers.join(
            polys,
            (F.col("clat") >= F.col("lat_min"))
            & (F.col("clat") <= F.col("lat_max"))
            & (F.col("clon") >= F.col("lon_min"))
            & (F.col("clon") <= F.col("lon_max")),
            "left",
        )
        .select("page_id", "poly_id")
        .collect()
    }
    assert set(got) == set(direct)
    for pid, (covered, poly) in got.items():
        assert covered == (direct[pid] is not None)
        assert poly == direct[pid]


def test_quadkey_prefix_and_bounds(spark):
    """Quadkey defining properties: every ancestor's key is a prefix,
    the point lies inside its tile's bounds, and sibling digits follow
    the (2·bit_y + bit_x) rule."""
    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.tiling import quadkey_tiles

    pts = spark.createDataFrame(
        [
            (0, 47.4979, 19.0402),   # Budapest
            (1, -89.9999, 179.9999), # clamp corner
            (2, 89.9999, -179.9999),
            (3, 0.0, 0.0),
        ],
        ["page_id", "lat", "lon"],
    )
    rows = {r["page_id"]: r for r in quadkey_tiles(pts, zoom=12).collect()}
    for r in rows.values():
        assert len(r["quadkey"]) == 12
        assert r["quadkey"].startswith(r["parent_quadkey"])
        assert 0 <= r["tile_x"] < 4096 and 0 <= r["tile_y"] < 4096
    # point-in-own-tile (strict on the open edges by construction)
    for pid, (lat, lon) in {0: (47.4979, 19.0402), 3: (0.0, 0.0)}.items():
        r = rows[pid]
        assert r["tile_lon_min"] <= lon < r["tile_lon_max"]
        assert r["tile_lat_min"] < lat <= r["tile_lat_max"]
    # zoom consistency: the zoom-11 key equals the zoom-12 key's prefix
    r11 = {r["page_id"]: r["quadkey"]
           for r in quadkey_tiles(pts, zoom=11).collect()}
    for pid, r in rows.items():
        assert r["quadkey"][:11] == r11[pid]
    # corner clamps land in the last tile
    assert rows[1]["tile_x"] == 4095 and rows[1]["tile_y"] == 4095
    assert rows[2]["tile_x"] == 0 and rows[2]["tile_y"] == 0

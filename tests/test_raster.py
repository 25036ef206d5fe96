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

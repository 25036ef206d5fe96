"""Point-to-polyline ops: snap pages to the nearest way (road).

The reference resolves way geometries per matched POI through PostGIS
(``online_poi_matching.py:213-223``); the distributed primitive a
crawl-scale pipeline needs is the *join* form — every geotagged page
snapped to its nearest way within a radius, in one plan.

Candidate generation is the kNN cell-ring layout with a completeness
argument extended to polylines: if a point is within ``r`` of a
segment, it is within ``r + seg_len/2`` of the segment's nearer
ENDPOINT, so probing the 3×3 ring of a grid whose pitch covers
``r + max_seg/2`` over the ways' NODE cells finds every candidate way.
The exact point-to-segment distance then runs ROW-LOCAL over the
candidate way's full node array (an ``array_min`` over the segment
fold — no explode of segments through any shuffle), and a min-struct
aggregate picks the winner per page.

Distances use the local-equirectangular projection around the page
(meters-per-degree scaled at the page latitude, exact segment
projection with clamped t) — a few meters of model error at city
scale, and bit-reproducible in SQL, which haversine-to-segment is not
(no closed form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tiling import coarse_cell_id, explode_ring3x3, explode_ring3x3_of_cell

_KY = 111194.9267  # meters per degree latitude (R=6371000)
_KX0 = 111319.4908  # meters per degree longitude at the equator


def point_segment_dist_m(
    plat: Column, plon: Column,
    alat: Column, alon: Column,
    blat: Column, blon: Column,
) -> Column:
    """Meters from point P to segment AB in P-local equirect coords.
    Degenerate segments (A==B) fall back to point distance (t=0)."""
    kx = F.lit(_KX0) * F.cos(F.radians(plat))
    ax, ay = (alon - plon) * kx, (alat - plat) * F.lit(_KY)
    bx, by = (blon - plon) * kx, (blat - plat) * F.lit(_KY)
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    t_raw = -(ax * dx + ay * dy) / den
    t = F.when(den > 0.0, F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    cx, cy = ax + t * dx, ay + t * dy
    return F.sqrt(cx * cx + cy * cy)


def _min_segment_dist(nodes, plat, plon, lat_of, lon_of) -> Column:
    """Row-local min distance from (plat, plon) to the polyline."""
    n = F.size(nodes)
    seg = lambda i: point_segment_dist_m(  # noqa: E731
        plat, plon,
        lat_of(F.element_at(nodes, i)), lon_of(F.element_at(nodes, i)),
        lat_of(F.element_at(nodes, i + 1)), lon_of(F.element_at(nodes, i + 1)),
    )
    return F.when(
        n >= 2,
        F.array_min(F.transform(F.sequence(F.lit(1), n - 1), seg)),
    ).otherwise(
        point_segment_dist_m(
            plat, plon,
            lat_of(F.element_at(nodes, 1)), lon_of(F.element_at(nodes, 1)),
            lat_of(F.element_at(nodes, 1)), lon_of(F.element_at(nodes, 1)),
        )
    )


def nearest_way(
    points: DataFrame,
    ways: DataFrame,
    lat_of,
    lon_of,
    radius_m: float,
    max_seg_m: float,
    mult: int,
    point_key: str = "page_id",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Nearest way within ``radius_m`` of each point.

    ``ways`` needs (way_id, nodes:array<bigint>); node geometry comes
    from the ``lat_of``/``lon_of`` id→coord mapping (lookup-free, or
    pre-resolved ids). ``mult`` must give a grid pitch ≥
    ``radius_m + max_seg_m/2`` at every data latitude — the caller
    asserts that once per scheme; the 3×3 ring is then exhaustive.
    Returns (point_key, way_id, distance_m) winners (ties → smaller
    way_id), inner semantics like kNN.

    ``broadcast_candidates=False``: planet-scale path — no hint, ring
    explode on the (way, node-cell) side (the way table is the smaller
    side in rows AND the explode output is re-deduped per (way, ring
    cell) before the exchange, so node arrays cross the shuffle at most
    9× per occupied cell, vs 9× per PAGE on a probe-side explode).
    Winner-identical by ring symmetry (tests/test_ways.py).
    """
    # candidate (way, node-cell) pairs, deduped per cell
    cand = (
        ways.select("way_id", F.explode("nodes").alias("nid"), "nodes")
        .withColumn("cand_cell", coarse_cell_id(lat_of(F.col("nid")), lon_of(F.col("nid")), mult))
        .select("way_id", "cand_cell", "nodes")
        .dropDuplicates(["way_id", "cand_cell"])
    )
    if broadcast_candidates:
        probe = explode_ring3x3(
            points.select(point_key, "lat", "lon"), "lat", "lon", mult,
            out="probe_cell",
        )
        cand = F.broadcast(cand)
    else:
        probe = points.select(point_key, "lat", "lon").withColumn(
            "probe_cell", coarse_cell_id(F.col("lat"), F.col("lon"), mult)
        )
        # a way reaches the same ring cell through several of its node
        # cells — dedupe again so each (way, cell) ships once
        cand = explode_ring3x3_of_cell(
            cand.withColumnRenamed("cand_cell", "_c"), "_c", out="cand_cell"
        ).drop("_c").dropDuplicates(["way_id", "cand_cell"])
    d = _min_segment_dist(F.col("nodes"), F.col("lat"), F.col("lon"), lat_of, lon_of)
    hits = (
        probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))
        .select(point_key, "way_id", d.alias("distance"))
        .where(F.col("distance") < F.lit(float(radius_m)))
        # a way can be found through several of its node cells — the
        # distance is identical, min-struct collapses the duplicates
        .groupBy(point_key)
        .agg(F.min(F.struct("distance", "way_id")).alias("b"))
        .select(
            point_key,
            F.col("b.way_id").alias("way_id"),
            F.round("b.distance", 2).alias("distance_m"),
        )
    )
    return hits

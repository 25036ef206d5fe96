"""Density-based spatial clustering (DBSCAN) over POI points.

The reference conflates duplicate POIs pairwise (its fuzzy matcher walks
per-record candidate lists, ``libs/poi_matchmaker.py``); what it never
offers — and what a planet-scale conflation pipeline needs — is the
*grouping* step: every dense knot of same-area POIs collapsed into one
cluster in a single distributed pass. This module adds classic DBSCAN
(Ester et al., KDD'96) re-expressed as three relational stages, each of
which already has a measured scale shape elsewhere in this engine:

1. **ε-pair generation** — :func:`distance_band_pairs`: a cell-bucketed
   self-join (the kNN grid from ``tiling.py``: probe side explodes its
   3×3 coarse-cell ring, candidate side keeps one cell, equi-join on
   the cell id, exact haversine post-filter). Never all-pairs: the only
   shuffle is the cell-keyed co-location, identical to the
   ``operators/knn.py`` layout but self-joined, and the ring explode
   stays on the probe side (measured cheaper — match.py stage-5 A/B).
2. **Core rule** — a degree aggregate over the pair set (map-side
   partial combine; one row per point crosses the shuffle).
3. **Clustering** — :func:`~.dedup.connected_components` (min-label
   propagation + pointer jumping) over CORE-CORE edges only; border
   points attach to the smallest cluster id among their core
   neighbours, everything else is noise. Component input is the edge
   set, never the point table — at 10^8 POIs the dense-pair graph is
   the small derived thing, exactly like the near-dup LSH pair graph.

Determinism: cluster id = smallest core point id in the component;
border ties resolve to the smallest cluster id. Both rules are pure
MIN aggregates, so the output is stable under any partitioning and
reproducible by the DuckDB oracle's recursive-CTE closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import haversine_m
from ..tiling import coarse_cell_id, coarse_mult_for_radius, explode_ring3x3
from .dedup import connected_components


def distance_band_pairs(
    points: DataFrame, eps_m: float, key: str = "osm_id"
) -> DataFrame:
    """All point pairs within ``eps_m`` meters, each once (``a < b``).

    ``points`` needs (key, lat, lon). The coarse grid pitch is chosen so
    one ring step covers ``eps_m`` (``coarse_mult_for_radius``), making
    the 3×3 ring probe exhaustive. Returns (a, b, distance).
    """
    mult = coarse_mult_for_radius(eps_m)
    probe = explode_ring3x3(
        points.select(F.col(key).alias("a"), "lat", "lon"),
        "lat",
        "lon",
        mult,
        out="probe_cell",
    )
    cand = points.select(
        F.col(key).alias("b"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
    ).withColumn("cand_cell", coarse_cell_id(F.col("b_lat"), F.col("b_lon"), mult))
    dist = haversine_m(F.col("lat"), F.col("lon"), F.col("b_lat"), F.col("b_lon"))
    return (
        probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))
        .where((F.col("a") < F.col("b")) & (dist < F.lit(float(eps_m))))
        .select("a", "b", dist.alias("distance"))
    )


def dbscan_clusters(
    points: DataFrame,
    eps_m: float,
    min_pts: int,
    key: str = "osm_id",
) -> DataFrame:
    """DBSCAN roles + cluster ids for every input point.

    A point is **core** iff its ε-neighbourhood (itself included, the
    KDD'96 convention) holds ≥ ``min_pts`` points; core points connected
    through core-core ε-edges share a cluster (id = min core point id);
    a non-core point with ≥ 1 core ε-neighbour is **border** and joins
    its smallest-id neighbouring cluster; the rest is **noise**
    (cluster NULL). Returns (key, role, cluster).
    """
    pairs = distance_band_pairs(points, eps_m, key=key).persist()
    edges = pairs.select("a", "b").union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("n_nbr"))
    core = (
        deg.where(F.col("n_nbr") + 1 >= F.lit(int(min_pts)))
        .select("node")
        .persist()
    )
    if min_pts <= 1:
        # degree-0 points never enter `pairs`; with min_pts<=1 they are
        # still core (singleton clusters) — pull them from the base table.
        core = (
            points.select(F.col(key).alias("node")).distinct().persist()
        )

    core_a = core.select(F.col("node").alias("a"))
    core_b = core.select(F.col("node").alias("b"))
    core_edges = pairs.join(core_a, "a", "left_semi").join(core_b, "b", "left_semi")

    comp = connected_components(core_edges, left="a", right="b")
    # Isolated core points (no core-core edge) are singleton clusters.
    comp = comp.unionByName(
        core.join(comp.select(F.col("node")), "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
    ).persist()

    # Border: non-core endpoints of an edge whose other end is core.
    border = (
        edges.join(core.select(F.col("node").alias("a")), "a", "left_anti")
        .join(
            comp.select(F.col("node").alias("b"), "component"),
            "b",
        )
        .groupBy(F.col("a").alias("node"))
        .agg(F.min("component").alias("component"))
    )

    roles = comp.select("node", F.lit("core").alias("role"), "component").unionByName(
        border.select("node", F.lit("border").alias("role"), "component")
    )
    out = (
        points.select(F.col(key).alias("node"))
        .join(roles, "node", "left")
        .select(
            F.col("node").alias(key),
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.col("component").alias("cluster"),
        )
    )
    return out

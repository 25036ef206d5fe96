"""k-ring cell-expansion kNN — nearest-POI assignment.

The reference's only kNN is a scipy ``cdist`` argmin over in-memory arrays
(``libs/gis.py:14-42``); BASELINE.json's north_star requires the distributed
analogue: "k-ring cell-expansion kNN for nearest-POI assignment".

Strategy: a radius-bounded nearest-1 (or nearest-k) join. The coarse cell
size is picked so a 3×3 ring covers the radius (tiling.coarse_mult_for_radius);
the 9× ring replication lives on the PROBE side, pipelined in-task into a
broadcast probe of the unexploded candidate table — the measured-faster
layout for the broadcast path (see operators/match.py stage 5 for the
control-bracketed A/B; a 9×-exploded broadcast hash relation costs more
than the 9 extra cheap probes save). Haversine post-filter, then a
min-struct aggregate (k=1) or min-by window (k>1). Points with no
candidate inside the radius are reported unmatched (left join, NULL osm_id)
— at planetary scale an unbounded nearest-neighbor would force ring
escalation loops; bounding the search radius keeps the plan a single
shuffle of ~one row per point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..geo import haversine_m
from ..tiling import (
    coarse_cell_id,
    coarse_mult_for_radius,
    explode_ring3x3,
    explode_ring3x3_of_cell,
)


def nearest_poi(
    points: DataFrame,
    pois: DataFrame,
    radius_m: float,
    k: int = 1,
    point_key: str = "page_id",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Top-k nearest POIs within ``radius_m`` of each point.

    ``points`` needs (point_key, lat, lon); ``pois`` needs (osm_id, lat, lon).
    Returns (point_key, osm_id, distance, knn_rank), only points with >=1
    candidate in range (inner semantics — callers left-join if they need
    the misses).

    ``broadcast_candidates``: True (default) = the country-scale plan —
    probe-side ring explode into a broadcast of the UNexploded candidate
    table (pois ~10^6 rows broadcasts; the 9 probe rows per point are
    generated and consumed inside the same task, no shuffle, and the
    hash relation stays 9× smaller than a candidate-side explode would
    make it — the measured-faster tradeoff, match.py stage 5 A/B).
    False = the planet-scale degradation path (10^8-row POI tables blow
    the broadcast limit): no hint — the optimizer picks sort-merge /
    shuffled-hash on the ring cell — and the 9× ring explode moves to
    the CANDIDATE side so the smaller table carries the fan-out through
    the exchange (same side rule as match.py's shuffle path; winners
    are identical by ring symmetry, tested in tests/test_knn.py).
    """
    mult = coarse_mult_for_radius(radius_m)
    if broadcast_candidates:
        probe = explode_ring3x3(
            points.select(point_key, "lat", "lon"), "lat", "lon", mult, out="probe_cell"
        )
        cand = pois.select(
            "osm_id", F.col("lat").alias("o_lat"), F.col("lon").alias("o_lon")
        ).withColumn("cand_cell", coarse_cell_id(F.col("o_lat"), F.col("o_lon"), mult))
        cand = F.broadcast(cand)
    else:
        probe = points.select(point_key, "lat", "lon").withColumn(
            "probe_cell", coarse_cell_id(F.col("lat"), F.col("lon"), mult)
        )
        cand = explode_ring3x3_of_cell(
            pois.select(
                "osm_id", F.col("lat").alias("o_lat"), F.col("lon").alias("o_lon")
            ).withColumn("_c", coarse_cell_id(F.col("o_lat"), F.col("o_lon"), mult)),
            "_c",
            out="cand_cell",
        ).drop("_c")

    dist = haversine_m(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon"))
    joined = (
        probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))
        .withColumn("distance", dist)
        .where(F.col("distance") < F.lit(float(radius_m)))
    )
    if k == 1:
        # min(struct) instead of a row_number window: the aggregate gets
        # map-side partial combining, so each shuffle partition ships one
        # candidate per point instead of every in-radius pair (same trick
        # as match.py's winner selection; identical ordering semantics —
        # struct lexicographic order = ORDER BY distance, osm_id).
        best = F.min(F.struct("distance", "osm_id")).alias("b")
        return (
            joined.groupBy(point_key)
            .agg(best)
            .select(
                point_key,
                F.col("b.osm_id").alias("osm_id"),
                F.col("b.distance").alias("distance"),
                F.lit(1).alias("knn_rank"),
            )
        )
    w = Window.partitionBy(point_key).orderBy("distance", "osm_id")
    return (
        joined.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(point_key, "osm_id", "distance", "knn_rank")
    )


def nearest_poi_expanding(
    points: DataFrame,
    pois: DataFrame,
    radii: tuple[float, ...] = (250.0, 2000.0),
    k: int = 1,
    point_key: str = "page_id",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Ring-expansion kNN: escalate the search radius only for misses.

    In dense mega-cells a big radius examines thousands of candidates per
    point even though the true NN is meters away; in sparse areas a small
    radius finds nothing. Escalating rounds give exact same results as a
    single pass at max(radii) — if the NN lies within a smaller radius it
    is also the NN at every larger one — while the expensive wide ring only
    runs on the (few) points the tight ring missed. This is the distributed
    analogue of the north_star's "k-ring cell-expansion kNN".

    Each round is a checkpoint-friendly narrow plan; at 10^12 scale rounds
    would be separate jobs writing found/missing to Iceberg between them.
    Locally each round's hits PERSIST (the in-session analogue of that
    inter-round checkpoint): the hits frame is consumed twice — by the
    result union and by the next round's anti-join — and without a
    materialization the whole round recomputes per consumer (measured
    2.04 s → 1.69 s at sf0.1/local[32] from this persist alone).
    MEMORY_ONLY, sized like the OUTPUT (one row per matched point), so
    under pressure the LRU drops blocks instead of spilling them to disk
    — recompute is cheap, eviction churn is not (see match.py on why big
    intermediate persists are the caller's checkpoint decision; these are
    small and round-scoped by design).
    """
    from pyspark.storagelevel import StorageLevel

    remaining = points
    found = None
    for r in sorted(radii):
        hits = nearest_poi(
            remaining,
            pois,
            r,
            k=k,
            point_key=point_key,
            broadcast_candidates=broadcast_candidates,
        ).persist(StorageLevel.MEMORY_ONLY)
        found = hits if found is None else found.unionByName(hits)
        remaining = remaining.join(
            hits.select(point_key).distinct(), point_key, "left_anti"
        )
    return found


def nearest_competitor(
    pois: DataFrame,
    radius_m: float,
    key: str = "osm_id",
    name: str = "name",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Nearest DIFFERENT-brand POI within ``radius_m`` of each POI — the
    competitor-distance read-off behind catchment/cannibalization
    analyses (and the reference's avoid-name checks, inverted). Same
    cell-ring self-join layout as :func:`nearest_poi` (probe-side ring,
    candidates broadcast, min-struct winner with map-side combine);
    the brand inequality is null-safe (NULL vs 'X' counts as a
    competitor, NULL vs NULL does not). Returns
    (key, competitor_id, competitor_name, distance_m), inner semantics.

    ``broadcast_candidates=False`` is the planet-scale self-join path:
    no broadcast hint, ring explode on the candidate arm (a self-join
    has no smaller side; moving the fan-out to the candidate arm keeps
    the two paths winner-identical by ring symmetry — see nearest_poi).
    """
    mult = coarse_mult_for_radius(radius_m)
    cand = pois.select(
        F.col(key).alias("b_id"),
        F.col(name).alias("b_name"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
    )
    if broadcast_candidates:
        probe = explode_ring3x3(
            pois.select(key, name, "lat", "lon"), "lat", "lon", mult, out="probe_cell"
        )
        cand = F.broadcast(
            cand.withColumn(
                "cand_cell", coarse_cell_id(F.col("b_lat"), F.col("b_lon"), mult)
            )
        )
    else:
        probe = pois.select(key, name, "lat", "lon").withColumn(
            "probe_cell", coarse_cell_id(F.col("lat"), F.col("lon"), mult)
        )
        cand = explode_ring3x3_of_cell(
            cand.withColumn(
                "_c", coarse_cell_id(F.col("b_lat"), F.col("b_lon"), mult)
            ),
            "_c",
            out="cand_cell",
        ).drop("_c")
    dist = haversine_m(F.col("lat"), F.col("lon"), F.col("b_lat"), F.col("b_lon"))
    return (
        probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))
        .where(
            (F.col(key) != F.col("b_id"))
            & ~F.col(name).eqNullSafe(F.col("b_name"))
            & (dist < F.lit(float(radius_m)))
        )
        .groupBy(key)
        .agg(F.min(F.struct(dist.alias("d"), F.col("b_id"), F.col("b_name"))).alias("b"))
        .select(
            key,
            F.col("b.b_id").alias("competitor_id"),
            F.col("b.b_name").alias("competitor_name"),
            F.round("b.d", 2).alias("distance_m"),
        )
    )

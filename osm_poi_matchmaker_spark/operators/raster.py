"""Raster ↔ vector bridge (BASELINE.json north_rule; no reference
analogue — SURVEY.md §4 last row, §7 step 10).

A coverage layer (admin boundary, buildable-area mask, water mask …) is
**rasterized once** into a per-cell mask table keyed by the engine's grid
cell id (tiling.py), then joined back **vector-side** as a cell-keyed
lookup — points inherit coverage with a plain equi-join on ``cell_id``,
no per-point geometry test.

Scale shape: the mask table is small relative to the point table (one row
per covered cell, ~10^6 rows for a country at ~300 m pitch) and static —
write it bucketed/sorted by ``cell_id`` (or broadcast it when it fits) so
the coverage join is co-located with the page table's cell layout and
never reshuffles the 100 TB side.

Two rasterizers:

- :func:`rasterize_rects` — axis-aligned layers (bbox tiles, quadkeys):
  the covered cell range is closed-form, generated with built-in
  ``sequence``/``explode`` — whole-stage codegen, zero Python, and exactly
  reproducible in ANSI SQL (the DuckDB oracle runs the same arithmetic).
- :func:`rasterize_polygons` — general WKT polygons: candidate cells from
  the bbox expansion, then a center-point-in-polygon test through the
  broadcast ray-cast kernel of operators/pip.py.

A cell is covered iff its **center** lies inside the shape (GDAL default
rasterization rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tiling import X_SPAN


def _axis_cell_range(lo: Column, hi: Column, origin: float, mult: int):
    """Index range [ceil((lo+o)*m - .5), floor((hi+o)*m - .5)] of cells whose
    center coordinate falls inside [lo, hi]."""
    m = F.lit(float(mult))
    start = F.ceil((lo + F.lit(origin)) * m - F.lit(0.5)).cast("long")
    end = F.floor((hi + F.lit(origin)) * m - F.lit(0.5)).cast("long")
    return start, end


def rasterize_rects(
    rects: DataFrame,
    mult: int,
    key: str = "poly_id",
) -> DataFrame:
    """Rasterize axis-aligned rectangles (lat_min/lat_max/lon_min/lon_max
    columns) to a (cell_id, <key>) mask on the ``mult`` cells-per-degree
    grid. Pure column expressions; one output row per covered cell."""
    y_lo, y_hi = _axis_cell_range(F.col("lat_min"), F.col("lat_max"), 90.0, mult)
    x_lo, x_hi = _axis_cell_range(F.col("lon_min"), F.col("lon_max"), 180.0, mult)
    return (
        rects.select(
            F.col(key),
            F.explode(F.sequence(y_lo, y_hi)).alias("cy"),
            x_lo.alias("x_lo"),
            x_hi.alias("x_hi"),
        )
        .select(
            key,
            F.explode(F.sequence(F.col("x_lo"), F.col("x_hi"))).alias("cx"),
            "cy",
        )
        .select(
            (F.col("cy") * F.lit(X_SPAN) + F.col("cx")).alias("cell_id"), key
        )
    )


def rasterize_polygons(
    polys: DataFrame,
    mult: int,
    key: str = "poly_id",
    wkt: str = "wkt",
) -> DataFrame:
    """General-polygon rasterizer: bbox candidate cells (computed from the
    WKT's coordinate extremes), then keep cells whose center passes the
    broadcast ray-cast point-in-polygon test (operators/pip.py)."""
    from .pip import point_in_polygon

    nums = F.split(F.regexp_replace(F.col(wkt), r"[^0-9. ,-]", ""), r"[ ,]+")
    pairs = F.filter(nums, lambda s: s != F.lit(""))
    lons = F.transform(
        F.filter(F.sequence(F.lit(0), F.size(pairs) - 1), lambda i: i % 2 == 0),
        lambda i: F.element_at(pairs, i + 1).cast("double"),
    )
    lats = F.transform(
        F.filter(F.sequence(F.lit(0), F.size(pairs) - 1), lambda i: i % 2 == 1),
        lambda i: F.element_at(pairs, i + 1).cast("double"),
    )
    boxed = polys.withColumns(
        {
            "lat_min": F.array_min(lats),
            "lat_max": F.array_max(lats),
            "lon_min": F.array_min(lons),
            "lon_max": F.array_max(lons),
        }
    )
    cand = rasterize_rects(boxed, mult, key=key)
    m = F.lit(float(mult))
    centers = cand.select(
        "cell_id",
        F.col(key).alias("cand_key"),
        ((F.floor(F.col("cell_id") / X_SPAN) + 0.5) / m - 90.0).alias("lat"),
        ((F.col("cell_id") % X_SPAN + 0.5) / m - 180.0).alias("lon"),
    ).withColumn("point_id", F.monotonically_increasing_id())
    hit = point_in_polygon(centers, polys, point_key="point_id", poly_id=key, wkt_col=wkt)
    return (
        centers.join(hit, "point_id")
        .where(F.col("poly_id") == F.col("cand_key"))
        .select("cell_id", F.col("cand_key").alias(key))
    )


def zonal_stats(
    cell_values: DataFrame,
    mask: DataFrame,
    value: str = "n_points",
    cell_col: str = "cell_id",
    key: str = "poly_id",
) -> DataFrame:
    """Zonal statistics — the aggregation twin of :func:`coverage_join`
    (classic raster GIS: per-zone mean/sum of a raster layer, e.g.
    population per admin polygon). ``cell_values`` is any cell-keyed
    raster (the cell histogram, a KDE mass layer); ``mask`` is the
    rasterized zone layer. One equi-join on the cell id + one partial-agg
    groupBy per zone — the raster side never shuffles more than its
    occupied cells, and at scale both sides share the cell-bucketed
    layout (co-located join, same argument as coverage_join).

    A cell covered by k overlapping zones contributes to all k (standard
    zonal-stats semantics). Returns (key, n_cells, total, v_min, v_max,
    mean) with mean rounded for cross-engine hash stability.
    """
    joined = cell_values.join(mask, cell_col)
    return (
        joined.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(value).cast("long").alias("total"),
            F.min(value).cast("long").alias("v_min"),
            F.max(value).cast("long").alias("v_max"),
        )
        .select(
            key,
            "n_cells",
            "total",
            "v_min",
            "v_max",
            F.round(F.col("total") / F.col("n_cells"), 6).alias("mean"),
        )
    )


def coverage_join(
    points: DataFrame,
    mask: DataFrame,
    cell_col: str = "cell_id",
    key: str = "poly_id",
) -> DataFrame:
    """Vector-side coverage lookup: equi-join points to the cell mask.
    Adds ``covered`` (bool) and the mask key (null when uncovered). The
    mask side is broadcast when small; at scale both sides share the
    cell-bucketed layout so this is a co-located join."""
    return points.join(F.broadcast(mask), cell_col, "left").withColumn(
        "covered", F.col(key).isNotNull()
    )

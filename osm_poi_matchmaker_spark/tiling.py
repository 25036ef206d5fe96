"""Equal-angle tiling layer — the spatial join key of the whole engine.

The reference (osm_poi_matchmaker) matches each POI with per-row PostGIS
queries guarded by GiST indexes (``libs/osm_prepare.py:14-90``,
``dao/poi_base.py:519-719``). At 10^12-page scale the analogue is a
cell-keyed distributed join: every point gets a cell id, candidate sets are
restricted to a k-ring of cells around the point, and the cell id doubles
as the table layout key (partition/bucket column) so Catalyst prunes scans.

We use an equal-angle grid instead of true H3/S2 (the h3 lib is not
available here, and an arithmetic grid keeps the cell id a pure column
expression — no UDF, no shuffle-side Python). Resolution is chosen so the
cell size matches H3 res-9 (~174 m hex edge):

    step   = 1/640 degree  → lat pitch 173.9 m; lon pitch 115–122 m over
             the Hungarian bbox (lat 45.7–48.6).
    x      = floor((lon + 180) * 640)   in [0, 230400)  < 2^18
    y      = floor((lat +  90) * 640)   in [0, 115200)  < 2^17
    cell   = y * 2^18 + x               (fits comfortably in int64)

Everything is exact IEEE double arithmetic — the identical formula is
reproducible in any ANSI SQL engine, which is how the DuckDB oracles in
``__spark_entry__.py`` validate it.

k-ring expansion (the reference's search-radius analogue,
``dao/poi_base.py:528`` ``ST_DistanceSphere(way, point) < :distance``) is an
``explode`` over (dx, dy) offsets — a built-in UDTF, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID_MULT = 640.0  # cells per degree (1/640° ≈ H3 res-9 pitch)
X_SPAN = 1 << 18  # row-major stride: cell = y * X_SPAN + x
# Minimum metric cell dimension over the Hungarian bbox: lon pitch at the
# northernmost latitude 48.6°N = 111320 * cos(48.6°) / 640 = 115.0 m.
MIN_CELL_METERS = 115.0

# SQL fragment mirrored by the DuckDB oracles (keep in sync with cell_id()).
CELL_ID_SQL = (
    "(CAST(FLOOR(({lat} + 90.0) * 640.0) AS BIGINT) * 262144 "
    "+ CAST(FLOOR(({lon} + 180.0) * 640.0) AS BIGINT))"
)


def cell_x(lon: Column) -> Column:
    return F.floor((lon + F.lit(180.0)) * F.lit(GRID_MULT)).cast("long")


def cell_y(lat: Column) -> Column:
    return F.floor((lat + F.lit(90.0)) * F.lit(GRID_MULT)).cast("long")


def cell_id(lat: Column, lon: Column) -> Column:
    """int64 cell id for a WGS84 point. Pure column expression."""
    return cell_y(lat) * F.lit(X_SPAN) + cell_x(lon)


def cell_of(df: DataFrame, lat: str = "lat", lon: str = "lon", out: str = "cell_id") -> DataFrame:
    return df.withColumn(out, cell_id(F.col(lat), F.col(lon)))


def kring_k_for_radius(radius_m: float) -> int:
    """Smallest k such that a k-ring of cells covers a metric radius.

    +1 guards the case where the query point sits on a cell border. The
    guarantee (every point within radius_m of p lies in kring(cell(p), k))
    is property-tested in tests/test_tiling.py.
    """
    return int(math.ceil(radius_m / MIN_CELL_METERS)) + 1


def kring_cells(cell: Column, k: int) -> Column:
    """Array of the (2k+1)^2 cell ids within Chebyshev distance k.

    Built-in ``sequence``/``transform``/``flatten`` — stays inside
    whole-stage codegen, no Python.
    """
    dxs = F.sequence(F.lit(-k), F.lit(k))
    return F.flatten(
        F.transform(
            dxs,
            lambda dy: F.transform(F.sequence(F.lit(-k), F.lit(k)), lambda dx: cell + dy * F.lit(X_SPAN) + dx),
        )
    )


def explode_kring(
    df: DataFrame, cell_col: str = "cell_id", k: int = 1, out: str = "probe_cell"
) -> DataFrame:
    """Explode each row into its k-ring: the probe side of a cell join.

    Fan-out is (2k+1)^2 rows; at radius 300 m (reference distance_perfect,
    ``utils/config.py:241-295``) k=4 → 81 cells. On the 100 TB path the
    probe side is the smaller, already-filtered geotagged subset, and the
    join key (probe_cell) aligns with the candidate table's layout.
    """
    return df.withColumn(out, F.explode(kring_cells(F.col(cell_col), k)))


# ---------------------------------------------------------------------------
# Coarse multi-resolution cells: radius-sized cells + a fixed 3×3 ring.
#
# A fine-cell k-ring at radius 300 m costs an 81× fan-out; at 10^12 pages
# that IS the shuffle bottleneck. Instead, radius-bounded joins pick a
# coarser grid whose minimum cell pitch >= the radius, so a 3×3 ring (9×
# fan-out, constant) is guaranteed to cover it. The binding dimension over
# the Hungarian bbox is the lon pitch at 48.6°N: 111320*cos(48.6°)/mult
# = 73616/mult meters.
# ---------------------------------------------------------------------------
MAX_LON_METERS_PER_DEG = 73616.0  # at the northern edge of the HU bbox


def coarse_mult_for_radius(radius_m: float, max_lat: float = 48.6) -> int:
    """Largest power-of-two cells-per-degree whose min pitch >= radius_m.

    Longitude pitch shrinks by cos(lat), so ring completeness at
    latitude L needs ``radius_m <= (MAX_LON_METERS_PER_DEG / mult) *
    cos(L) / cos(48.6°)`` (MAX_LON_METERS_PER_DEG is the pitch×mult at
    the HU northern edge, 48.6°N). ``max_lat`` is the caller's promise
    about the data extent: the selected grid is checked against the
    pitch AT that latitude and a marginal radius fails LOUDLY instead
    of silently dropping near-pitch pairs (radii that brush the pitch —
    e.g. 300 m on the 434 m/256 grid → 287 m at 48.5°N — used to MISS
    pairs with no runtime signal). Callers at higher latitudes pass
    their own ``max_lat``; callers at marginal radii drop to the next
    coarser grid or shrink the radius (see poi_dbscan @400/mult128 and
    brand_colocation @250/mult256 for worked margins)."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be > 0, got {radius_m}")
    mult = 512
    while mult > 1 and MAX_LON_METERS_PER_DEG / mult < radius_m:
        mult //= 2
    pitch_at_lat = (
        MAX_LON_METERS_PER_DEG / mult
    ) * math.cos(math.radians(max_lat)) / math.cos(math.radians(48.6))
    if radius_m > pitch_at_lat:
        raise ValueError(
            f"radius {radius_m} m exceeds the {pitch_at_lat:.1f} m grid pitch "
            f"at latitude {max_lat}° (mult {mult}); the 3x3 ring would miss "
            "near-pitch pairs — shrink the radius or the latitude extent"
        )
    return mult


def coarse_cell_id(lat: Column, lon: Column, mult: int) -> Column:
    """Cell id on a coarser grid (same row-major layout, X_SPAN stride).

    Ids are only comparable within one ``mult`` namespace — every ring join
    uses a single mult on both sides.
    """
    y = F.floor((lat + F.lit(90.0)) * F.lit(float(mult))).cast("long")
    x = F.floor((lon + F.lit(180.0)) * F.lit(float(mult))).cast("long")
    return y * F.lit(X_SPAN) + x


def explode_ring3x3(
    df: DataFrame, lat: str, lon: str, mult: int, out: str = "probe_cell"
) -> DataFrame:
    """3×3 ring around the row's coarse cell — the probe side of a
    radius-bounded join (fixed 9× fan-out regardless of radius)."""
    cell = coarse_cell_id(F.col(lat), F.col(lon), mult)
    offsets = F.array(*[F.lit(dy * X_SPAN + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    return df.withColumn(out, F.explode(F.transform(offsets, lambda o: cell + o)))


def coarse_ring_spec(radius_m: float, max_lat: float = 48.6) -> tuple[int, int]:
    """(mult, k): grid + smallest Chebyshev ring radius covering
    ``radius_m`` at ``max_lat``. k=1 (the 3×3 ring) whenever the radius
    fits the pitch — the common case, identical to
    :func:`coarse_mult_for_radius`; larger radii get a wider
    (2k+1)×(2k+1) ring instead of a silent near-pitch miss (two points
    at distance d span at most ``floor(d/pitch)+1`` cells per axis).
    Use this for radius parameters a caller may legitimately set beyond
    the mult=1 pitch (e.g. match_cascade's name-arm bound); use the
    strict function when a marginal radius means the OPERATOR's grid
    choice is wrong."""
    if radius_m <= 0:
        raise ValueError(f"radius_m must be > 0, got {radius_m}")
    mult = 512
    while mult > 1 and MAX_LON_METERS_PER_DEG / mult < radius_m:
        mult //= 2
    pitch_at_lat = (
        MAX_LON_METERS_PER_DEG / mult
    ) * math.cos(math.radians(max_lat)) / math.cos(math.radians(48.6))
    return mult, int(radius_m // pitch_at_lat) + 1


def explode_ringk(
    df: DataFrame, lat: str, lon: str, mult: int, k: int, out: str = "probe_cell"
) -> DataFrame:
    """(2k+1)×(2k+1) ring around the row's coarse cell — the general
    form of :func:`explode_ring3x3` for radii beyond the grid pitch."""
    cell = coarse_cell_id(F.col(lat), F.col(lon), mult)
    offsets = F.array(
        *[
            F.lit(dy * X_SPAN + dx)
            for dy in range(-k, k + 1)
            for dx in range(-k, k + 1)
        ]
    )
    return df.withColumn(out, F.explode(F.transform(offsets, lambda o: cell + o)))


def explode_ring3x3_of_cell(df: DataFrame, cell: str, out: str) -> DataFrame:
    """3×3 ring around an ALREADY-COMPUTED cell id column — the
    candidate side of the shuffle degradation path (ring adjacency is
    symmetric: cand's ring covers probe's cell iff probe's ring covers
    cand's, so moving the 9× explode to whichever side is smaller
    preserves the join's hit set exactly)."""
    offsets = F.array(*[F.lit(dy * X_SPAN + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    return df.withColumn(out, F.explode(F.transform(offsets, lambda o: F.col(cell) + o)))


def tile_pyramid(
    points: DataFrame, cell: str = "cell_id", levels: int = 4
) -> DataFrame:
    """Multi-resolution tile-count pyramid (the hypertable-rollup /
    vector-tile-pyramid shape; generalizes the reference's per-table
    admin rollups in ``dao/poi_base.py`` to a tiling hierarchy).

    Level 0 is the base-grid histogram; level L halves both axes L
    times (``x >> L``, ``y >> L`` of the row-major id). The point table
    is scanned and shuffled exactly ONCE (the level-0 partial-agg
    groupBy); coarser levels then come from exploding ``levels``
    parent ids per already-reduced base cell and re-aggregating — a
    second shuffle over levels × |occupied cells| rows, which is tiny
    next to the point count. (A per-level union of cascaded aggs reads
    nicer but physically re-scans the source once per level unless the
    base is materialized — this shape never does.)

    Returns (level:int, cell_id:long, n_pages:long). Ids are only
    comparable within one level.
    """
    base = points.groupBy(F.col(cell).alias("cell_id")).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    # one (level, parent_id) struct per level, derived from the base id
    # by exact integer halving (ids are non-negative)
    lvl_structs = F.array(
        *[
            F.struct(
                F.lit(lvl).alias("level"),
                F.expr(
                    f"((cell_id div {X_SPAN}) div {1 << lvl}) * {X_SPAN}"
                    f" + ((cell_id % {X_SPAN}) div {1 << lvl})"
                ).alias("pcell"),
            )
            for lvl in range(levels)
        ]
    )
    return (
        base.select(F.explode(lvl_structs).alias("lp"), "n_pages")
        .groupBy(
            F.col("lp.level").alias("level"), F.col("lp.pcell").alias("cell_id")
        )
        .agg(F.sum("n_pages").alias("n_pages"))
    )


def compact_cells(occupied: DataFrame, cell: str = "cell_id", levels: int = 3) -> DataFrame:
    """Minimal multi-resolution cover of an occupied cell set — the
    H3 ``compact`` analogue on the row-major grid: wherever all four
    children of a half-resolution parent are present, the parent
    replaces them, applied ``levels`` times bottom-up. Coverage masks
    shrink by the density of their solid interiors (a country-scale
    water/admin mask compacts its lake interiors to a handful of coarse
    cells while coastlines stay fine) — smaller mask = smaller
    broadcast/bucket table for coverage_join.

    Shape per level: one groupBy(parent) over the CURRENT level's cells
    (count == 4 → promote) + one anti-join to keep unpromoted cells —
    everything is sized by occupied cells, shrinking per level; the
    level count bounds the rounds. Deterministic (pure set algebra).
    Returns (level:int, cell_id:long) — ids in each level's own
    namespace, exactly invertible by uncompacting each parent to its
    4^level descendants.
    """
    cur = occupied.select(F.col(cell).alias("cell_id")).distinct()
    out = None
    for lvl in range(levels):
        parent = (
            F.expr(f"(cell_id div {X_SPAN}) div 2") * F.lit(X_SPAN)
            + F.expr(f"(cell_id % {X_SPAN}) div 2")
        )
        tagged = cur.withColumn("_p", parent)
        promoted = (
            tagged.groupBy("_p").agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") == 4)
            .select(F.col("_p"))
        )
        kept = tagged.join(promoted, "_p", "left_anti").select("cell_id")
        lvl_rows = kept.select(F.lit(lvl).alias("level"), "cell_id")
        out = lvl_rows if out is None else out.unionByName(lvl_rows)
        cur = promoted.select(F.col("_p").alias("cell_id"))
    return out.unionByName(cur.select(F.lit(levels).alias("level"), "cell_id"))


def hotspot_cells(
    points: DataFrame,
    cell: str = "cell_id",
    factor: tuple[int, int] = (2, 1),
    min_count: int = 2,
) -> DataFrame:
    """Spatial hotspot detection: cells whose point count exceeds
    ``factor`` × the mean of their 3×3 ring (a Getis-Ord-style local
    statistic kept integer-exact: ``cnt * 8 * f_den > f_num * ring_sum``
    cross-multiplies the mean away, so the DuckDB oracle hashes
    identically — empty neighbors count as zero mass, exactly what the
    populated-neighbors ring sum already encodes).

    Scale shape: one partial-agg groupBy(cell) over the points (the only
    shuffle that sees point-count rows), then a fixed 8× explode of the
    OCCUPIED-cell histogram re-aggregated by neighbor id and joined back
    — every later stage is sized by occupied cells, not points. No
    window over a global ordering, no driver collection.

    Returns (cell_id, n_points, ring_sum, n_neighbors, is_peak) for
    hotspot cells only; ``is_peak`` marks strict local maxima.
    """
    f_num, f_den = factor
    counts = points.groupBy(F.col(cell).alias("cell_id")).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    x = F.col("cell_id") % F.lit(X_SPAN)
    y = F.expr(f"cell_id div {X_SPAN}")
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    ring = (
        counts.select(
            F.explode(offs).alias("o"), x.alias("x"), y.alias("y"), "n_points"
        )
        .where(
            (F.col("x") + F.col("o.dx") >= 0)
            & (F.col("x") + F.col("o.dx") < X_SPAN)
            & (F.col("y") + F.col("o.dy") >= 0)
        )
        .select(
            (
                (F.col("y") + F.col("o.dy")) * F.lit(X_SPAN)
                + F.col("x")
                + F.col("o.dx")
            ).alias("ncell"),
            "n_points",
        )
        .groupBy("ncell")
        .agg(
            F.sum("n_points").alias("ring_sum"),
            F.count(F.lit(1)).alias("n_neighbors"),
            F.max("n_points").alias("max_neighbor"),
        )
    )
    return (
        counts.join(ring, counts.cell_id == ring.ncell, "left")
        .where(
            (F.col("n_points") >= min_count)
            & (
                F.col("n_points") * F.lit(8 * f_den)
                > F.lit(f_num) * F.coalesce(F.col("ring_sum"), F.lit(0))
            )
        )
        .select(
            "cell_id",
            "n_points",
            F.coalesce(F.col("ring_sum"), F.lit(0)).alias("ring_sum"),
            F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
            (
                F.col("n_points") > F.coalesce(F.col("max_neighbor"), F.lit(0))
            ).alias("is_peak"),
        )
    )


_BINOM5 = (1, 4, 6, 4, 1)  # 5-tap binomial = discrete Gaussian, sum 16


def kde_smooth(points: DataFrame, cell: str = "cell_id") -> DataFrame:
    """Kernel-density smoothing of the cell histogram — the raster twin
    of hotspot detection, kept INTEGER-exact: the separable 5×5
    binomial kernel (outer product of 1-4-6-4-1, total mass 256) stands
    in for a Gaussian, and the smoothed value is reported as
    ``kde_mass_256`` = Σ w(dx,dy)·count(cell+d) in 1/256 units — BIGINT
    all the way, so the DuckDB oracle hashes identically (the standard
    GIS "heatmap layer" without a single float).

    Scale shape (same as hotspot_cells): one partial-agg groupBy(cell)
    over the points, then a fixed 25× explode of the OCCUPIED-cell
    histogram re-aggregated by target cell — all later stages sized by
    occupied cells, not points. Grid-edge guards keep x from wrapping
    rows. Returns (cell_id, n_points, kde_mass_256) for every cell that
    receives mass (n_points = 0 for empty cells under the kernel's
    skirt).
    """
    counts = points.groupBy(F.col(cell).alias("cell_id")).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    x = F.col("cell_id") % F.lit(X_SPAN)
    y = F.expr(f"cell_id div {X_SPAN}")
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(_BINOM5[dx + 2] * _BINOM5[dy + 2]).alias("w"),
            )
            for dy in (-2, -1, 0, 1, 2)
            for dx in (-2, -1, 0, 1, 2)
        ]
    )
    spread = (
        counts.select(
            F.explode(offs).alias("o"), x.alias("x"), y.alias("y"), "n_points"
        )
        .where(
            (F.col("x") + F.col("o.dx") >= 0)
            & (F.col("x") + F.col("o.dx") < X_SPAN)
            & (F.col("y") + F.col("o.dy") >= 0)
        )
        .select(
            (
                (F.col("y") + F.col("o.dy")) * F.lit(X_SPAN)
                + F.col("x")
                + F.col("o.dx")
            ).alias("tcell"),
            (F.col("n_points") * F.col("o.w")).alias("mass"),
        )
        .groupBy("tcell")
        .agg(F.sum("mass").cast("bigint").alias("kde_mass_256"))
    )
    return spread.join(
        counts, spread.tcell == counts.cell_id, "left"
    ).select(
        F.col("tcell").alias("cell_id"),
        F.coalesce("n_points", F.lit(0)).alias("n_points"),
        "kde_mass_256",
    )


def kde_pyramid(points: DataFrame, cell: str = "cell_id", levels: int = 4) -> DataFrame:
    """Multi-zoom heatmap pyramid: the :func:`kde_smooth` base layer
    downsampled ``levels`` times by exact mass summation (a coarser
    tile's heat is the sum of its children's — the standard heatmap
    downsample; re-smoothing per level would change the kernel, not the
    picture, and cost a scan each). Same single-scan cascade shape as
    :func:`tile_pyramid`: the point table is touched once (inside
    kde_smooth), every later stage is sized by occupied cells × levels.

    Returns (level:int, cell_id:long, kde_mass_256:long) —
    integer-exact at every level, ids comparable only within a level.
    """
    base = kde_smooth(points, cell).select("cell_id", "kde_mass_256")
    lvl_structs = F.array(
        *[
            F.struct(
                F.lit(lvl).alias("level"),
                F.expr(
                    f"((cell_id div {X_SPAN}) div {1 << lvl}) * {X_SPAN}"
                    f" + ((cell_id % {X_SPAN}) div {1 << lvl})"
                ).alias("parent"),
            )
            for lvl in range(levels)
        ]
    )
    return (
        base.select(F.explode(lvl_structs).alias("l"), "kde_mass_256")
        .groupBy(
            F.col("l.level").alias("level"), F.col("l.parent").alias("cell_id")
        )
        .agg(F.sum("kde_mass_256").cast("bigint").alias("kde_mass_256"))
    )


# ---------------------------------------------------------------------------
# Quadkey tile addressing (round 4): Bing-style base-4 tile keys over the
# engine's EQUAL-ANGLE grid (tx = floor((lon+180)/360 · 2^z),
# ty = floor((90−lat)/180 · 2^z)) — the interop read-off an XYZ/quadkey
# tile server consumes. Using the equal-angle grid (not Web-Mercator)
# keeps every coordinate → tile mapping pure rational arithmetic: no
# tan/ln whose last-ulp differences between the JVM and C libm could
# flip a floor at a tile boundary, so the DuckDB oracle is exact — and
# it is the same family of grids the rest of tiling.py (pyramids, KDE,
# compact_cells) already uses. The quadkey string's defining property
# holds regardless of projection: a tile's key is PREFIXED by every
# ancestor's key, so zoom-out aggregation is substr().
# ---------------------------------------------------------------------------


def tile_xy(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    n = 1 << zoom
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long")
    ty = F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(float(n))).cast("long")
    # clamp the poles/antimeridian edge (lat == -90 / lon == 180)
    tx = F.least(tx, F.lit(n - 1))
    ty = F.least(ty, F.lit(n - 1))
    return tx, ty


def quadkey(lat: Column, lon: Column, zoom: int) -> Column:
    """Base-4 quadkey string of the zoom-``zoom`` tile containing the
    point: digit i (MSB first) = 2·bit_i(ty) + bit_i(tx)."""
    tx, ty = tile_xy(lat, lon, zoom)
    digits = [
        (
            F.shiftright(ty, i).bitwiseAND(F.lit(1)) * F.lit(2)
            + F.shiftright(tx, i).bitwiseAND(F.lit(1))
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def quadkey_tiles(
    df: DataFrame,
    zoom: int = 12,
    parent_zoom: int = 6,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-point tile addressing: (… input key columns …, tile_x,
    tile_y, quadkey, parent_quadkey, tile bounds). ``parent_quadkey``
    is a substr of ``quadkey`` (the ancestor-prefix property), so any
    zoom-out rollup is a groupBy on a string prefix — no re-derivation
    from coordinates."""
    n = 1 << zoom
    tx, ty = tile_xy(F.col(lat), F.col(lon), zoom)
    qk = quadkey(F.col(lat), F.col(lon), zoom)
    lon_min = tx.cast("double") * F.lit(360.0 / n) - F.lit(180.0)
    lat_max = F.lit(90.0) - ty.cast("double") * F.lit(180.0 / n)
    return df.select(
        "*",
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        qk.alias("quadkey"),
        F.substring(qk, 1, parent_zoom).alias("parent_quadkey"),
        F.round(lon_min, 9).alias("tile_lon_min"),
        F.round(lon_min + F.lit(360.0 / n), 9).alias("tile_lon_max"),
        F.round(lat_max - F.lit(180.0 / n), 9).alias("tile_lat_min"),
        F.round(lat_max, 9).alias("tile_lat_max"),
    )

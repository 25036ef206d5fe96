"""Broadcast point-in-polygon join (J4 postcode / J5 city lookups).

Reference behavior: per-POI PostGIS ``ST_Contains(way, point)`` queries
(``libs/osm.py:32-49, 92-109``). At scale: polygons are the SMALL side
(admin boundaries, postcode areas — thousands, not billions), so they are
broadcast to every executor as WKT; points stream through a ``mapInPandas``
pandas iterator that runs a numpy-vectorized ray-cast (even-odd rule)
against a per-executor prebuilt polygon index. No shuffle of the point
side at all — the plan is scan → mapInPandas → (optional) dim join.

The index buckets polygon bboxes on the coarse cell grid (tiling.py) — an
STRtree substitute with the same O(1)-candidates-per-point property for
admin-style tilings; shapely isn't available in this environment.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """'POLYGON((x y, x y, ...))' → (N,2) float array (outer ring only)."""
    inner = wkt.strip()[len("POLYGON((") : -2]
    pts = [p.strip().split() for p in inner.split(",")]
    return np.array([[float(x), float(y)] for x, y in pts], dtype="float64")


def _ray_cast(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-ring test for many points, one ring."""
    inside = np.zeros(px.shape[0], dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for xa, ya, xb, yb in zip(x0, y0, x1, y1):
        crosses = (ya > py) != (yb > py)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (px < xint)
    return inside


class PolygonIndex:
    """bbox-pruned polygon set; built once per executor from broadcast rows."""

    def __init__(self, rows: list[tuple]):
        # rows: (poly_id, wkt)
        self.ids = [r[0] for r in rows]
        self.rings = [parse_wkt_polygon(r[1]) for r in rows]
        self.bboxes = np.array(
            [
                [r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max()]
                for r in self.rings
            ]
        )

    def locate(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Per point: first containing poly_id (or -1)."""
        out = np.full(lon.shape[0], -1, dtype="int64")
        for i, (pid, ring) in enumerate(zip(self.ids, self.rings)):
            xmin, xmax, ymin, ymax = self.bboxes[i]
            cand = (out == -1) & (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
            if not cand.any():
                continue
            hit = _ray_cast(lon[cand], lat[cand], ring)
            idxs = np.nonzero(cand)[0][hit]
            out[idxs] = pid
        return out


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    point_key: str = "page_id",
    poly_id: str = "poly_id",
    wkt_col: str = "way_wkt",
    swap_xy: bool = False,
    order_by: str | None = None,
) -> DataFrame:
    """(point_key, lat, lon) × broadcast polygons → (point_key, poly_id).

    Points with no containing polygon get poly_id = -1 (kept, so callers
    can distinguish 'outside every boundary' — reference returns None
    there, libs/osm.py:47).

    ``swap_xy`` preserves the reference's J5 city-lookup quirk: the probe
    point is built ``ST_MakePoint(:lat,:lon)`` — latitude on the x axis
    (libs/osm.py:97) — so containment tests the SWAPPED point. ``order_by``
    names a polygon column; candidates are tested in ascending order of it,
    so the first hit reproduces ``ORDER BY name LIMIT 1`` (libs/osm.py:98).
    """
    if order_by is not None:
        collected = polygons.select(poly_id, wkt_col, order_by).orderBy(order_by, poly_id).collect()
    else:
        collected = polygons.select(poly_id, wkt_col).collect()
    poly_rows = [(r[poly_id], r[wkt_col]) for r in collected]
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(poly_rows)
    schema = T.StructType(
        [
            T.StructField(point_key, T.LongType()),
            T.StructField("poly_id", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = PolygonIndex(bc.value)
        for pdf in batches:
            xs, ys = (
                ("lat", "lon") if swap_xy else ("lon", "lat")
            )
            located = index.locate(
                pdf[xs].to_numpy("float64"), pdf[ys].to_numpy("float64")
            )
            yield pd.DataFrame(
                {point_key: pdf[point_key].to_numpy("int64"), "poly_id": located.astype("int32")}
            )

    return points.select(point_key, "lat", "lon").mapInPandas(run, schema)

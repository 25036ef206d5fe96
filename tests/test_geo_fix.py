"""``check_hu_boundary`` parity (reference ``libs/geo.py:71-93``): the
swap must be ATOMIC (both outputs read the raw inputs) and the
missing-decimal repoint must slice like the reference
(``'{}.{}'.format(s[:2], s[3:])`` — 3rd digit dropped; >1 dot in the
result → keep the integer part only, :83-86)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from osm_poi_matchmaker_spark.extract.geotag import geotag_pages
from osm_poi_matchmaker_spark.geo import with_fixed_hu_coordinates

CASES = [
    # (lat_in, lon_in) → (lat_out, lon_out) per the reference
    ((47.4979, 19.0407), (47.4979, 19.0407)),  # in-range: untouched
    ((19.0407, 47.4979), (47.4979, 19.0407)),  # swapped source → swap back
    ((0.0, 19.0407), (None, None)),            # zero coordinate → (None, None)
    ((47.4979, 0.0), (None, None)),
    ((None, 19.0407), (None, None)),
    # repoint: '47123456' → '47' + '.' + s[3:] = 47.23456 (3rd digit dropped)
    ((47123456.0, 19.0407), (47.23456, 19.0407)),
    ((47.5, 19040700.0), (47.5, 19.407)),
    # slice result grows a 2nd dot → integer part only (libs/geo.py:83-86)
    ((4712345.6, 19.0407), (47.0, 19.0407)),
]


def test_fix_hu_coordinates_golden(spark):
    schema = StructType(
        [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
    )
    df = spark.createDataFrame([c[0] for c in CASES], schema)
    got = [(r["lat"], r["lon"]) for r in with_fixed_hu_coordinates(df).collect()]
    for (inp, want), out in zip(CASES, got):
        for w, o in zip(want, out):
            if w is None:
                assert o is None, f"{inp}: expected NULL, got {o}"
            else:
                assert o == pytest.approx(w, abs=1e-9), f"{inp}: {out} != {want}"


def test_geotag_swapped_page(spark):
    """End-to-end: a page whose source swapped lat/lon still lands on the
    true location (and its cell id is computed from the FIXED pair)."""
    rows = [
        (1, "https://cc.example/1",
         "POI Tesco | geo:4749790,1904070 | addr: City1, Street 1 2", "hu"),
        (2, "https://cc.example/2",
         "POI Tesco | geo:1904070,4749790 | addr: City1, Street 1 2", "hu"),
    ]
    pages = spark.createDataFrame(rows, ["page_id", "url", "text", "lang"])
    out = {r["page_id"]: r for r in geotag_pages(pages).collect()}
    assert out[1]["lat"] == pytest.approx(47.4979)
    assert out[1]["lon"] == pytest.approx(19.0407)
    # page 2 is the same point with the coordinates swapped at the source
    assert out[2]["lat"] == pytest.approx(out[1]["lat"])
    assert out[2]["lon"] == pytest.approx(out[1]["lon"])
    assert out[2]["cell_id"] == out[1]["cell_id"]

"""Source-reader tests over tiny in-repo fixtures (formats S10–S14)."""

from __future__ import annotations

import os

import pytest

from osm_poi_matchmaker_spark.sources.readers import (
    read_csv_source,
    read_excel_source,
    read_geojson_features,
    read_gtfs_stops,
    read_zipcodes_xml,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_csv_source(spark):
    df = read_csv_source(spark, f"{FIX}/sample.tsv")
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"Tesco", "Spar"}
    assert rows["Tesco"]["lat"] == 47.5


def test_geojson_hu_filter(spark):
    feats = read_geojson_features(spark, f"{FIX}/sample.geojson")
    names = {r["properties"]["name"] for r in feats.collect()}
    # HU-tagged + bbox-inside kept; Paris (outside, no country) and
    # Vienna (AT) dropped
    assert names == {"Tesco Expressz", "NoCountryInside"}


def test_gtfs_stops(spark):
    stops = read_gtfs_stops(spark, f"{FIX}/gtfs.zip")
    got = {r["stop_id"]: r["stop_name"] for r in stops.collect()}
    assert got == {"S1": "Budapest-Nyugati", "S2": "Szeged"}


def test_zipcodes_xml(spark):
    dim = read_zipcodes_xml(spark, f"{FIX}/zipcodes.xml")
    got = dict((r["city_post_code"], r["city_name"]) for r in dim.collect())
    assert got == {"1011": "Budapest", "9737": "Buk"}


def test_excel_gated(spark):
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_excel_source(spark, "/nonexistent.xlsx")

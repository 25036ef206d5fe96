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


def test_excel_sheet_parse(spark):
    """S12 raw sheet read: header row becomes columns, ints stay ints,
    empty cells become NULL (from-scratch stdlib XLSX parser)."""
    df = read_excel_source(spark, f"{FIX}/cities.xlsx", "Települések")
    assert df.columns == ["Irányítószám", "Településnév", "Településrész"]
    rows = {r["Irányítószám"]: r for r in df.collect()}
    assert rows[2000]["Településnév"] == "Szentendre"
    assert rows[2000]["Településrész"] is None
    assert rows[6000]["Településrész"] == "Hetényegyháza"


def test_excel_missing_sheet(spark):
    with pytest.raises(KeyError, match="Nope"):
        read_excel_source(spark, f"{FIX}/cities.xlsx", "Nope")


def test_excel_city_postcodes_semantics(spark):
    """hu_generic.process parity: main sheet minus Településrész, big-city
    sheets renamed + constant city, dedup keep-first on postcode."""
    from osm_poi_matchmaker_spark.sources.readers import read_city_postcodes_xlsx

    dim = read_city_postcodes_xlsx(spark, f"{FIX}/cities.xlsx")
    got = sorted((r["city_post_code"], r["city_name"]) for r in dim.collect())
    assert got == [
        (1011, "Budapest"),  # 1011 appears twice in Bp.u. — first kept, once
        (1052, "Budapest"),
        (2000, "Szentendre"),
        (2030, "Érd"),
        (3525, "Miskolc"),
        (6000, "Kecskemét"),
        (9400, "Sopron"),
    ]


def test_tesco_provider_mapping(spark):
    """hu_tesco.py:83-140 parity: coordinate swap, whitespace collapse,
    goldid strip, phone normalization, opening key mapping, and the
    4-way code classification with both S-Market city exceptions."""
    from osm_poi_matchmaker_spark.sources.providers import tesco_stores

    city = spark.createDataFrame(
        [("10001", "Budapest"), ("10002", "Győr"), ("10003", "Miskolc"),
         ("10004", "Szeged"), ("10005", "Levél")],
        ["ref", "city"],
    )
    rows = {
        r["ref"]: r
        for r in tesco_stores(spark, f"{FIX}/tesco.json", city).collect()
    }
    assert rows["10001"]["code"] == "hutescoexp"
    assert rows["10001"]["branch"] == "Tesco Fogarasi"  # whitespace collapsed
    assert rows["10002"]["code"] == "husmrktexp"  # 'xpres' but Győr
    assert rows["10003"]["code"] == "hutescoext"
    # store 3 feed has lat/lon swapped; check_hu_boundary fixes it
    assert rows["10003"]["lat"] == 48.1035 and rows["10003"]["lon"] == 19.0735
    assert rows["10003"]["phone"] == "+36 46 123 456"
    assert rows["10004"]["code"] == "hutescosup"
    assert rows["10005"]["code"] == "husmrktsup"  # Levél supermarket exception
    assert rows["10001"]["su_open"] == "07:00"  # key "0" = Sunday
    # without a resolved-city frame the exception lists never match
    no_city = {
        r["ref"]: r["code"]
        for r in tesco_stores(spark, f"{FIX}/tesco.json").collect()
    }
    assert no_city["10002"] == "hutescoexp"
    assert no_city["10005"] == "hutescosup"


def test_xlsx_roundtrip_inline_and_types():
    """Writer↔parser: bools, floats, rich strings, ragged rows."""
    from osm_poi_matchmaker_spark.sources.xlsx import parse_xlsx, write_xlsx

    rows = [
        ["a", "b", "c"],
        [1, 2.5, True],
        ["x&<y>", None, False],
    ]
    out = parse_xlsx(write_xlsx({"S": rows}), "S")
    assert out == [
        ["a", "b", "c"],
        [1, 2.5, True],
        ["x&<y>", None, False],
    ]

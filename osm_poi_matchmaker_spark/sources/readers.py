"""Source-format readers (SURVEY.md §2.1 S10–S14).

The reference's ~45 provider modules each hand-parse one feed format
(CSV/TSV, XML, Excel, GeoJSON, GTFS) row by row. Here each format is one
reader returning a DataFrame; provider-specific field mapping is a
projection on top. Feeds are dimension-scale inputs (thousands of rows) —
the 10^12-scale side is always the ``pages`` table — so driver-side
parsing of XML/GTFS-zip dims into createDataFrame is the right cost
model; the big-table formats (CSV/JSON) use distributed spark.read.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import in_hu_bbox


def read_csv_source(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    encoding: str = "utf-8",
    header: bool = True,
) -> DataFrame:
    """S10: delimited feed (the reference downloads tab-separated,
    sometimes UTF-16 CSVs — libs/pandas.py:18-50); distributed read."""
    return (
        spark.read.option("sep", sep)
        .option("encoding", encoding)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
    )


def read_geojson_features(
    spark: SparkSession, path: str, hu_only: bool = True
) -> DataFrame:
    """S13: FeatureCollection → one row per feature with (lat, lon,
    properties map); optional Hungary filter mirrors
    ``dataproviders/hu_alltheplaces.py:140-160`` (country prop or bbox)."""
    raw = spark.read.option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f")).select(
        F.col("f.geometry.coordinates")[1].cast("double").alias("lat"),
        F.col("f.geometry.coordinates")[0].cast("double").alias("lon"),
        F.col("f.properties").alias("properties"),
    )
    if hu_only:
        country = F.col("properties.addr_country")
        feats = feats.where(
            (country == "HU") | (country.isNull() & in_hu_bbox(F.col("lat"), F.col("lon")))
        )
    return feats


def read_gtfs_stops(spark: SparkSession, zip_path: str) -> DataFrame:
    """S14: GTFS feed → stops table (``dataproviders/hu_mav.py:55-106``
    iterates gtfs_kit stops; feeds are small dims → parse driver-side)."""
    with zipfile.ZipFile(zip_path) as zf:
        with zf.open("stops.txt") as fh:
            text = io.TextIOWrapper(fh, encoding="utf-8").read()
    lines = [ln for ln in text.splitlines() if ln.strip()]
    header = lines[0].split(",")
    rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    data = [
        (
            r.get("stop_id"),
            r.get("stop_name"),
            float(r["stop_lat"]) if r.get("stop_lat") else None,
            float(r["stop_lon"]) if r.get("stop_lon") else None,
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "stop_id string, stop_name string, stop_lat double, stop_lon double"
    )


def read_zipcodes_xml(spark: SparkSession, path: str) -> DataFrame:
    """S11: postal-code XML dim (``dataproviders/hu_generic.py:60-77``
    reads <postcode><city> pairs); stdlib parse → small DataFrame."""
    tree = ET.parse(path)
    rows = []
    for el in tree.getroot().iter("entry"):
        rows.append((el.findtext("postcode"), el.findtext("city")))
    return spark.createDataFrame(rows, "city_post_code string, city_name string")


def read_excel_source(spark: SparkSession, path: str, sheet: str = "0") -> DataFrame:
    """S12: Excel dim feed (``hu_generic.py:33-48``). openpyxl/xlrd are not
    installed in this environment — gate with a clear error; the calling
    provider falls back to a pre-converted CSV/parquet fixture."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "Excel source requires openpyxl (absent here); pre-convert the "
            "feed to CSV/parquet and use read_csv_source instead"
        ) from err
    import pandas as pd

    return spark.createDataFrame(pd.read_excel(path, sheet_name=sheet))

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


def read_excel_source(spark: SparkSession, path: str, sheet: str) -> DataFrame:
    """S12: Excel dim feed (``dataproviders/hu_generic.py:33-48`` —
    ``pd.ExcelFile(link).parse(sheet)``). No Excel library exists in this
    environment, so the workbook is decoded by the from-scratch stdlib
    XLSX parser in :mod:`.xlsx` (ZIP + XML parts, shared/inline strings).
    First row = header, like ExcelFile.parse; dims parse driver-side per
    the module cost model."""
    from .xlsx import parse_xlsx

    with open(path, "rb") as fh:
        rows = parse_xlsx(fh.read(), sheet)
    if not rows:
        raise ValueError(f"empty sheet {sheet!r} in {path}")
    header = [str(h) for h in rows[0]]
    return spark.createDataFrame(
        [tuple(r) for r in rows[1:]], header
    )


def read_city_postcodes_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """The full S12 provider semantics (``hu_generic.py:29-48``): the
    main settlements sheet minus its 'Településrész' column, unioned with
    one frame per big-city sheet — first column renamed to
    ``city_post_code``, a constant ``city_name``, and drop_duplicates on
    postcode keeping the FIRST occurrence (A5)."""
    import pandas as pd

    from .xlsx import parse_xlsx

    with open(path, "rb") as fh:
        data = fh.read()

    def sheet_pd(sheet: str) -> pd.DataFrame:
        rows = parse_xlsx(data, sheet)
        return pd.DataFrame(rows[1:], columns=[str(h) for h in rows[0]])

    main = sheet_pd("Települések")
    if "Településrész" in main.columns:
        del main["Településrész"]
    main = main.rename(
        columns={main.columns[0]: "city_post_code", main.columns[1]: "city_name"}
    )[["city_post_code", "city_name"]]
    parts = [main]
    big_cities = [
        ["Budapest", "Bp.u."],
        ["Miskolc", "Miskolc u."],
        ["Debrecen", "Debrecen u."],
        ["Szeged", "Szeged u."],
        ["Pécs", "Pécs u."],
        ["Győr", "Győr u."],
    ]
    for city, sheet in big_cities:
        try:
            df = sheet_pd(sheet)
        except KeyError:
            continue
        df.columns.values[0] = "city_post_code"
        df["city_name"] = city
        df = df[["city_post_code", "city_name"]]
        df.drop_duplicates("city_post_code", keep="first", inplace=True)
        parts.append(df)
    out = pd.concat(parts, ignore_index=True)
    out["city_post_code"] = out["city_post_code"].astype("int64")
    return spark.createDataFrame(out)


def read_street_types_xml(spark: SparkSession, path: str) -> DataFrame:
    """Street-type vocabulary XML dim (``dataproviders/hu_generic.py:79-103``
    street_type_from_xml): direct ``<streetType>`` children of the root;
    None-text elements are skipped, text is stripped — a whitespace-only
    element survives as ``''`` (the reference appends the stripped value
    unconditionally once text is non-None). The reference loads this into
    the ``street_type`` table which no application query ever reads
    (``libs/osm_prepare.py:20`` indexes it, zero callers) — implemented
    for source-format completeness."""
    tree = ET.parse(path)
    rows = [
        (el.text.strip(),)
        for el in tree.getroot().findall("streetType")
        if el.text is not None
    ]
    return spark.createDataFrame(rows, "street_type string")


_POI_PATCH_COLS = [
    "poi_code", "orig_postcode", "orig_city", "orig_street",
    "orig_housenumber", "orig_conscriptionnumber", "orig_name",
    "new_postcode", "new_city", "new_street", "new_housenumber",
    "new_conscriptionnumber", "new_name",
]


def read_poi_patch_csv(spark: SparkSession, path: str) -> DataFrame:
    """Address-patch dim (``dataproviders/hu_generic.py:105-123``
    poi_patch_from_csv + ``dao/data_handlers.py:632-658``).

    Faithful quirks: the file is TAB-separated despite the .csv name
    (link=None routes ``libs/pandas.py:42`` ``sep='\\t'``); NaN→None then
    ``str()`` through the ORM ctor, so an empty cell stores the literal
    ``'None'`` and any numeric-inferred column renders pandas floats
    (``'2030.0'``). Like ``street_type``, the target table is dead in the
    reference (``search_poi_patch`` has zero callers) — source parity
    only. Dim-sized → driver-side parse per the module cost model."""
    import pandas as pd
    import numpy as np

    df = pd.read_csv(path, encoding="UTF-8", sep="\t", skiprows=0)
    df = df.replace({np.nan: None})
    df.columns = _POI_PATCH_COLS
    data = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return spark.createDataFrame(
        data, ", ".join(f"{c} string" for c in _POI_PATCH_COLS)
    )

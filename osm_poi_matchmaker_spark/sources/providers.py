"""Provider-mapping layer: one declarative DataFrame plan per feed.

The reference has ~45 ``dataproviders/*.py`` modules, each a row-at-a-time
loop that parses one feed and pushes every record through the
``POIDatasetRaw`` property setters (``libs/poi_dataset.py:180-705``) —
each setter invoking a scalar cleaner, and several doing a per-record SQL
round-trip (street fuzzy match, city PIP). Here a provider is a single
projection: the feed parses with ``spark.read.json``/``explode``, every
setter becomes the corresponding column expression or Arrow UDF from
``functions/``, and the round-trip enrichments (city PIP J5, fuzzy street
J7) compose set-wide AFTER the projection instead of per record.

``tesco_stores`` reproduces the densest provider
(``dataproviders/hu_tesco.py:83-140``) field-for-field: branch/ref via
clean_string, website template over clean_url, opening-hours JSON keyed
"1".."6"/"0" = Mo..Sa/Su, HU-boundary coordinate fix, street/housenumber/
conscriptionnumber extraction, and the 4-way store-code classification
with its city exception lists ('xpres' outside {Győr, Sopron,
Mosonmagyaróvár, Levél} → hutescoexp else husmrktexp; 'xtra' →
hutescoext; else hutescosup unless Levél → husmrktsup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import fix_hu_coordinates
from ..functions.spark_udfs import (
    clean_phone_udf,
    clean_string_udf,
    clean_url_udf,
    extract_street_udf,
)

_OPENING_T = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

# hu_tesco.py:115-127 — the S-Market exception cities
_SMARKET_EXP_CITIES = ["Győr", "Sopron", "Mosonmagyaróvár", "Levél"]
_SMARKET_SUP_CITIES = ["Levél"]


def tesco_stores(
    spark: SparkSession, json_path: str, city: DataFrame | None = None
) -> DataFrame:
    """Parse a Tesco store feed (``{"stores": [...]}``) into POI-raw rows.

    ``city`` is the resolved-city lookup ``(ref → city_name)`` — the
    output of the city PIP operator (J5, operators/pip.py) run over the
    feed coordinates; the reference does this per record with
    ``query_osm_city_name_gpd`` (hu_tesco.py:114-115). When None the
    city (and the city-dependent code classification) stays NULL-safe:
    no city matches either exception list, mirroring the reference's
    ``None not in [...]`` outcome.
    """
    raw = spark.read.option("multiLine", "true").json(json_path)
    s = raw.select(F.explode("stores").alias("s")).select("s.*")

    opening = F.from_json(F.col("opening"), _OPENING_T)
    ex = extract_street_udf(F.col("address"))
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("gpslat").cast("double"), F.col("gpslng").cast("double")
    )
    url_clean = clean_url_udf(F.col("urlname"))

    out = s.select(
        clean_string_udf(F.col("store_name")).alias("branch"),
        F.trim(F.col("goldid")).alias("ref"),
        F.when(
            url_clean.isNotNull(),
            F.concat(
                F.lit("https://tesco.hu/aruhazak/aruhaz/"), url_clean, F.lit("/")
            ),
        ).alias("website"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        ex.housenumber.alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("zipcode")).alias("postcode"),
        F.col("address").alias("original"),
        F.when(
            F.col("phone").isNotNull() & (F.col("phone") != ""),
            clean_phone_udf(F.col("phone")),
        ).alias("phone"),
        F.col("name").alias("feed_name"),
        # Mo..Sa = keys "1".."6", Su = key "0" (hu_tesco.py:102-108)
        *[
            opening[str(k)][i].alias(f"{d}_{oc}")
            for d, k in (
                ("mo", 1), ("tu", 2), ("we", 3), ("th", 4),
                ("fr", 5), ("sa", 6), ("su", 0),
            )
            for i, oc in ((0, "open"), (1, "close"))
        ],
        F.lit(False).alias("public_holiday_open"),
    )
    if city is not None:
        out = out.join(F.broadcast(city), "ref", "left")
    else:
        out = out.withColumn("city", F.lit(None).cast("string"))

    code = (
        F.when(
            F.col("feed_name").contains("xpres"),
            F.when(
                ~F.coalesce(F.col("city").isin(_SMARKET_EXP_CITIES), F.lit(False)),
                F.lit("hutescoexp"),
            ).otherwise(F.lit("husmrktexp")),
        )
        .when(F.col("feed_name").contains("xtra"), F.lit("hutescoext"))
        .otherwise(
            F.when(
                ~F.coalesce(F.col("city").isin(_SMARKET_SUP_CITIES), F.lit(False)),
                F.lit("hutescosup"),
            ).otherwise(F.lit("husmrktsup"))
        )
    )
    return out.withColumn("code", code).drop("feed_name")

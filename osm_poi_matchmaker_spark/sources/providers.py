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
    clean_city_udf,
    clean_email_udf,
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


def _strip(c):
    """Python ``str.strip()`` as a column expr (F.trim only eats spaces)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def _clean_opening_hours_2_expr(c):
    """``clean_opening_hours_2`` (address.py:558-564) as a column expr:
    raw '-1' → NULL, else strip + zfill(4) + '[:2]:[−2:]' colon insert
    (so ' -1' → '00:-1' — reference quirk preserved)."""
    t = _strip(c)
    padded = F.when(F.length(t) >= 4, t).otherwise(F.lpad(t, 4, "0"))
    return F.when(c.isNull() | (c == F.lit("-1")), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.substring(padded, 1, 2), F.lit(":"), F.substring(padded, -2, 2)
        )
    )


def spar_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Parse a SPAR store feed (top-level JSON array) into POI-raw rows —
    ``dataproviders/hu_spar.py:72-106`` as one declarative projection.

    Field semantics, in the reference's order:
      * 5-way code classification on the ORIGINAL feed name
        ('xpres' → husparecon, 'INTER' → husparisup, 'market' → husparsup,
        'DESPAR' → huspardcon, else husparsup) — hu_spar.py:79-88;
      * then the name is rewritten INTERSPAR→Interspar, SPAR→Spar
        (:89-92) — so 'DESPAR' renders as 'DESpar' downstream (quirk);
      * ref = first '(…)' group of the REWRITTEN name, stripped; absent
        → NULL (:93-95, PATTERN_SPAR_REF at :24);
      * branch = clean_string(name.split('(')[0]) (:98);
      * city/postcode/website cleaners, HU-boundary lat/lon swap,
        street/housenumber/conscriptionnumber extraction (:96-104).
    """
    s = spark.read.option("multiLine", "true").json(json_path)

    name_r = F.regexp_replace(
        F.regexp_replace(F.col("name"), "INTERSPAR", "Interspar"), "SPAR", "Spar"
    )
    code = (
        F.when(F.col("name").contains("xpres"), F.lit("husparecon"))
        .when(F.col("name").contains("INTER"), F.lit("husparisup"))
        .when(F.col("name").contains("market"), F.lit("husparsup"))
        .when(F.col("name").contains("DESPAR"), F.lit("huspardcon"))
        .otherwise(F.lit("husparsup"))
    )
    ref = F.when(
        name_r.rlike(r"\(.*?\)"), _strip(F.regexp_extract(name_r, r"\((.*?)\)", 1))
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("latitude").cast("double"), F.col("longitude").cast("double")
    )
    ex = extract_street_udf(F.col("address"))
    return s.select(
        code.alias("code"),
        ref.alias("ref"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_string_udf(F.col("zipCode")).alias("postcode"),
        clean_string_udf(F.split(name_r, r"\(").getItem(0)).alias("branch"),
        clean_url_udf(F.col("pageUrl")).alias("website"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        ex.housenumber.alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address")).alias("original"),
        F.lit(False).alias("public_holiday_open"),
    )


_CBA_DAYS = ("mo", "tu", "we", "th", "fr", "sa", "su")
_CBA_STORE_T = T.ArrayType(
    T.StructType(
        [T.StructField(f, T.StringType()) for f in ("P_NAME", "A_VAROS", "A_IRSZ", "A_CIM", "PS_GPS_COORDS_LAT", "PS_GPS_COORDS_LNG", "PS_PUBLIC_TEL", "PS_PUBLIC_EMAIL")]
        + [
            T.StructField(f"PS_OPEN_{oc}_{i}", T.StringType())
            for i in range(1, 8)
            for oc in ("FROM", "TO")
        ]
    )
)


def cba_stores(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """CBA/Príma stores from an HTML page column —
    ``dataproviders/hu_cba.py:66-105`` as one declarative projection over
    a DataFrame of pages (the reference downloads one page; at crawl scale
    this runs set-wide over ``pages.html``).

    The ``boltok_nyers`` JS variable is sliced out of the page by the
    Arrow-batched ``js_var_udf`` (F11, extract/html.py — the reference's
    ``extract_javascript_variable``, address.py:237-263), parsed with
    ``from_json``, and exploded; every per-record setter becomes a column:
    city/postcode/branch cleaners, 'Príma'-in-branch → huprimacon else
    hucbacon (:82), per-day ``clean_opening_hours_2`` (:83-90), raw
    ``A_CIM`` original (:91), HU-boundary swap (:92-93), street extraction
    (:94-95), ``clean_phone_to_str`` / ``clean_email`` (:96-97).
    """
    from ..extract.html import js_var_udf

    payload = js_var_udf(F.col(html_col), F.lit("boltok_nyers"))
    s = (
        pages.select(F.from_json(payload, _CBA_STORE_T).alias("stores"))
        .where(F.col("stores").isNotNull())
        .select(F.explode("stores").alias("s"))
        .select("s.*")
    )
    branch = clean_string_udf(F.col("P_NAME"))
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("PS_GPS_COORDS_LAT").cast("double"),
        F.col("PS_GPS_COORDS_LNG").cast("double"),
    )
    ex = extract_street_udf(F.col("A_CIM"))
    return s.select(
        F.when(branch.contains("Príma"), F.lit("huprimacon"))
        .otherwise(F.lit("hucbacon"))
        .alias("code"),
        clean_city_udf(F.col("A_VAROS")).alias("city"),
        clean_string_udf(F.col("A_IRSZ")).alias("postcode"),
        branch.alias("branch"),
        F.col("A_CIM").alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        ex.housenumber.alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("PS_PUBLIC_TEL")).alias("phone"),
        clean_email_udf(F.col("PS_PUBLIC_EMAIL")).alias("email"),
        *[
            _clean_opening_hours_2_expr(F.col(f"PS_OPEN_{oc}_{i + 1}")).alias(
                f"{d}_{suffix}"
            )
            for i, d in enumerate(_CBA_DAYS)
            for oc, suffix in (("FROM", "open"), ("TO", "close"))
        ],
        F.lit(False).alias("public_holiday_open"),
    )

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

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import fix_hu_coordinates
from ..functions.spark_udfs import (
    parse_address_udf,
    clean_city_title_udf,
    clean_city_udf,
    clean_email_udf,
    clean_phone_udf,
    clean_postcode_udf,
    clean_street_type_udf,
    clean_street_udf,
    clean_string_udf,
    clean_url_udf,
    extract_all_address_udf,
    extract_city_address_udf,
    extract_phone_udf,
    extract_street_udf,
    replace_html_newlines_udf,
    set_branch_udf,
    set_housenumber_udf,
    title_udf,
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
        # POIDatasetRaw setter chain: clean_branch then add()-time
        # clean_string (poi_dataset.py:219-221, :1095)
        set_branch_udf(F.col("store_name")).alias("branch"),
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
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_postcode_udf(F.col("zipcode")).alias("postcode"),
        clean_string_udf(F.col("address")).alias("original"),
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
        clean_postcode_udf(F.col("zipCode")).alias("postcode"),
        set_branch_udf(F.split(name_r, r"\(").getItem(0)).alias("branch"),
        clean_url_udf(F.col("pageUrl")).alias("website"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
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
    branch = set_branch_udf(F.col("P_NAME"))
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
        clean_postcode_udf(F.col("A_IRSZ")).alias("postcode"),
        branch.alias("branch"),
        clean_string_udf(F.col("A_CIM")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
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
        # a NULL branch raises on `'Príma' in branch` in the reference →
        # the record is skipped by its per-record except (hu_cba.py:98-101)
    ).where(F.col("branch").isNotNull())


# ---------------------------------------------------------------------------
# hu_posta (dataproviders/hu_posta.py:76-217) — XML feed, 3-way service-
# point classification, per-Hungarian-day opening hours with the
# reference's exact quirks (see posta_offices docstring).
# ---------------------------------------------------------------------------

# utils/enums.py:45-53 WeekDaysLongHU (Csütörtökön is an alias of 3)
_POSTA_DAY_SLOTS = (
    ("mo", ("Hétfő",)),
    ("tu", ("Kedd",)),
    ("we", ("Szerda",)),
    ("th", ("Csütörtök", "Csütörtökön")),
    ("fr", ("Péntek",)),
    ("sa", ("Szombat",)),
    ("su", ("Vasárnap",)),
)
_POSTA_ALL_DAYS = tuple(n for _, names in _POSTA_DAY_SLOTS for n in names)

_POSTA_SCHEMA = T.StructType(
    [
        T.StructField("zipcode", T.StringType()),
        T.StructField("post_name", T.StringType()),
        T.StructField("spt_raw", T.StringType()),
        T.StructField("city_raw", T.StringType()),
        T.StructField("has_street", T.BooleanType()),
        T.StructField("street_name_raw", T.StringType()),
        T.StructField("street_type_raw", T.StringType()),
        T.StructField("housenumber_raw", T.StringType()),
        T.StructField("wgslat", T.StringType()),
        T.StructField("wgslon", T.StringType()),
        T.StructField("phonearea", T.StringType()),
        T.StructField("email_raw", T.StringType()),
        T.StructField(
            "days",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("day", T.StringType()),
                        T.StructField("from1", T.StringType()),
                        T.StructField("to1", T.StringType()),
                        T.StructField("from2", T.StringType()),
                        T.StructField("to2", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_posta_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw <post> rows from the Magyar Posta XML feed. Tag lookups are
    recursive-first-match with lowercased names, mirroring the reference's
    BeautifulSoup(lxml) attribute access (``poi_data.servicepointtype``,
    ``poi_data.street.housenumber``, … hu_posta.py:80-216); a <days>
    element with no children is dropped like ``len(d) != 0``
    (hu_posta.py:120). One feed file → driver-side stdlib parse (the dim
    cost model used by every other source reader)."""
    import xml.etree.ElementTree as ET

    def txt(el):
        return None if el is None else "".join(el.itertext())

    def first(parent, name):
        if parent is None:
            return None
        for e in parent.iter():
            if e is not parent and e.tag.lower() == name:
                return e
        return None

    root = ET.parse(path).getroot()
    rows = []
    for post in (e for e in root.iter() if e.tag.lower() == "post"):
        street = first(post, "street")
        gps = first(post, "gpsdata")
        days = []
        for d in (e for e in post.iter() if e.tag.lower() == "days"):
            if len(d) == 0:
                continue
            days.append(
                (
                    txt(first(d, "day")),
                    txt(first(d, "from1")),
                    txt(first(d, "to1")),
                    txt(first(d, "from2")),
                    txt(first(d, "to2")),
                )
            )
        rows.append(
            (
                post.get("zipcode"),
                txt(first(post, "name")),
                txt(first(post, "servicepointtype")),
                txt(first(post, "city")),
                street is not None,
                txt(first(street, "name")),
                txt(first(street, "type")),
                txt(first(street, "housenumber")),
                txt(first(gps, "wgslat")),
                txt(first(gps, "wgslon")),
                txt(first(post, "phonearea")),
                txt(first(post, "email")),
                days,
            )
        )
    return spark.createDataFrame(rows, _POSTA_SCHEMA)


def posta_offices(spark: SparkSession, xml_path: str) -> DataFrame:
    """Magyar Posta offices (``dataproviders/hu_posta.py:76-217``) as one
    declarative projection. Reference quirks preserved:

    * rows whose name contains 'okmányiroda' / 'mol kirendeltség' are
      skipped (:86-89); unknown servicepointtype keeps code NULL (:101 —
      ``clear_all`` resets between records, poi_dataset.py:1146);
    * single-interval days close at **from1**, not to1 (:150-151 bug);
    * a day whose from1==from2 or to1==to2 is dropped as a feed
      duplicate (:146, :165-170) — later valid entries still overwrite;
    * the lunch break is captured from day_key==3 = **Csütörtök**
      (Thursday, despite the 'Wednesday' comment, :157-160);
    * nonstop counting uses Python substring membership
      ``from1 in '0:00'`` (:153, :163) and counts **entries**, not day
      slots; ≥7 → nonstop=True else NULL (:172-174);
    * branch: clean_branch setter chain, plus the hupostapo digit rewrite
      ``(\\d{1,3})`` → ``\\1. számú`` run through the setter twice
      (:110-112 + poi_dataset.py:219-221, :1095);
    * housenumber: text before '(', stripped, then the setter's len<16
      guard (so 'belterület HRSZ 3162' → NULL and the HRSZ branch at
      :104-106 is dead — conscriptionnumber is always NULL, :107);
    * original is synthesized from cleaned street parts + housenumber;
      a missing street name renders 'None …' via str.format, which the
      original setter's clean_string sentinel-maps back to NULL when bare
      (:181-199 + poi_dataset.py:592-593);
    * records the reference's per-record ``except`` would abort are
      dropped: missing name/servicepointtype/street element/GPS, and a
      valid day entry with NULL from1 (``None in '0:00'`` raises, :153).
    """
    raw = read_posta_xml(spark, xml_path)
    name_lc = F.lower(F.col("post_name"))

    def valid(e):
        return ~e["from1"].eqNullSafe(e["from2"]) & ~e["to1"].eqNullSafe(e["to2"])

    def matched(e):
        return e["day"].isin(*_POSTA_ALL_DAYS)

    kept = raw.where(
        F.col("post_name").isNotNull()
        & ~name_lc.contains("okmányiroda")
        & ~name_lc.contains("mol kirendeltség")
        & F.col("spt_raw").isNotNull()
        & F.col("has_street")
        & F.col("wgslat").isNotNull()
        & F.col("wgslon").isNotNull()
        & ~F.exists("days", lambda e: matched(e) & valid(e) & e["from1"].isNull())
    )

    spt = clean_string_udf(F.upper(F.col("spt_raw")))
    code = (
        F.when(spt == "PM", F.lit("hupostapo"))
        .when(spt == "CS", F.lit("hupostacso"))
        .when(spt == "PP", F.lit("hupostapp"))
    )
    pho = (
        F.when(spt.isin("PM", "PP"), F.lit(False))
        .when(spt == "CS", F.lit(True))
        .cast("boolean")
    )
    branch0 = set_branch_udf(F.col("post_name"))
    branch = F.when(
        code.eqNullSafe(F.lit("hupostapo")),
        set_branch_udf(
            F.regexp_replace(branch0, r"(\d{1,3})", "$1. számú")
        ),
    ).otherwise(branch0)

    hn = F.when(
        F.col("housenumber_raw").isNotNull(),
        set_housenumber_udf(_strip(F.split(F.col("housenumber_raw"), r"\(", 2).getItem(0))),
    )
    s1 = clean_street_udf(_strip(F.col("street_name_raw")))
    s2 = clean_street_type_udf(_strip(F.col("street_type_raw")))
    street = F.when(s2.isNull(), s1).when(s1.isNotNull(), F.concat_ws(" ", s1, s2))
    orig_base = F.coalesce(s1, F.lit("None"))
    original = clean_string_udf(
        F.when(
            s2.isNull(),
            F.when(hn.isNotNull(), F.concat_ws(" ", orig_base, hn)).otherwise(orig_base),
        ).when(
            s1.isNotNull(),
            F.when(hn.isNotNull(), F.concat_ws(" ", s1, s2, hn)).otherwise(
                F.concat_ws(" ", s1, s2)
            ),
        )
    )

    def last_valid(names):
        return F.try_element_at(
            F.filter("days", lambda e: e["day"].isin(*names) & valid(e)), F.lit(-1)
        )

    day_cols = []
    for d, names in _POSTA_DAY_SLOTS:
        ent = last_valid(names)
        day_cols.append(ent["from1"].alias(f"{d}_open"))
        day_cols.append(
            F.when(
                ent["from2"].isNull() | ent["to2"].isNull(), ent["from1"]
            ).otherwise(ent["to2"]).alias(f"{d}_close")
        )
    lbe = F.try_element_at(
        F.filter(
            "days",
            lambda e: e["day"].isin("Csütörtök", "Csütörtökön")
            & valid(e)
            & e["from2"].isNotNull()
            & e["to2"].isNotNull(),
        ),
        F.lit(-1),
    )
    nonstop_num = F.size(
        F.filter(
            "days",
            lambda e: matched(e)
            & valid(e)
            & F.lit("0:00").contains(e["from1"])
            & F.when(
                e["from2"].isNull() | e["to2"].isNull(),
                e["to1"].isin("0:00", "23:59", "24:00"),
            ).otherwise(e["to2"].isin("0:00", "23:59", "24:00")),
        )
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.regexp_replace(F.col("wgslat"), ",", ".").cast("double"),
        F.regexp_replace(F.col("wgslon"), ",", ".").cast("double"),
    )

    return kept.select(
        code.alias("code"),
        clean_postcode_udf(F.col("zipcode")).alias("postcode"),
        clean_city_udf(F.col("city_raw")).alias("city"),
        branch.alias("branch"),
        original.alias("original"),
        street.alias("street"),
        hn.alias("housenumber"),
        F.lit(None).cast("string").alias("conscriptionnumber"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        F.when(F.col("phonearea").isNotNull(), clean_phone_udf(F.col("phonearea"))).alias("phone"),
        F.when(F.col("email_raw").isNotNull(), clean_email_udf(F.col("email_raw"))).alias("email"),
        F.when(nonstop_num >= 7, F.lit(True)).cast("boolean").alias("nonstop"),
        pho.alias("public_holiday_open"),
        lbe["to1"].alias("lunch_break_start"),
        lbe["from2"].alias("lunch_break_stop"),
        *day_cols,
    )


# ---------------------------------------------------------------------------
# hu_alltheplaces (dataproviders/hu_alltheplaces.py) — the largest provider:
# a spider registry derived from the ATP insights JSON, plus a per-spider
# GeoJSON feature importer.
# ---------------------------------------------------------------------------

_ATP_INSIGHTS_T = T.StructType(
    [
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("nsi_brand", T.StringType()),
                        T.StructField("q_title", T.StringType()),
                        T.StructField(
                            "atp_splits",
                            T.MapType(
                                T.StringType(),
                                T.MapType(T.StringType(), T.LongType()),
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# hu_alltheplaces.py:95-125 — keyword → poi_type cascade, in source order
_ATP_TYPE_RULES = (
    (("fuel", "petrol", "benzin", "_gas", "mol_hu", "shell", "eni_", "bp_"), "fuel"),
    (("atm",), "atm"),
    (("bank",), "bank"),
    (("pharmacy", "patika", "apotheke", "benu", "pingvin"), "pharmacy"),
    (("charging", "_ev_", "electr"), "charging_station"),
    (("post_office", "_posta", "postamt"), "post_office"),
    (("fastfood", "fast_food", "mcdonald", "burger", "kfc", "subway_"), "fastfood"),
    (("chemist", "droger", "rossmann", "dm_"), "chemist"),
    (("clothes", "fashion", "takko", "pepco", "jysk"), "clothes"),
    (("shoes", "deichmann", "ccc_"), "shoes"),
    (("optician", "optic"), "optician"),
    (("diy", "obi_", "baumax", "bauhaus"), "doityourself"),
    (("cosmetic", "perfum", "douglas", "yves_rocher"), "cosmetics"),
    (("furniture", "ikea"), "furniture"),
    (("tobacco", "dohany"), "tobacco"),
)


def _cap(x):
    """Python ``str.capitalize()`` as a column expr (first upper, rest lower)."""
    return F.concat(
        F.upper(F.substring(x, 1, 1)), F.lower(x.substr(F.lit(2), F.length(x)))
    )


def _drop_trailing_2(parts):
    """Drop trailing 2-char segments (``while parts and len(parts[-1])==2:
    parts.pop()``, hu_alltheplaces.py:135-137) as a pure array expr."""
    trailing = F.aggregate(
        F.reverse(parts),
        F.struct(F.lit(0).alias("cnt"), F.lit(True).alias("going")),
        lambda acc, x: F.struct(
            F.when(acc["going"] & (F.length(x) == 2), acc["cnt"] + 1)
            .otherwise(acc["cnt"])
            .alias("cnt"),
            (acc["going"] & (F.length(x) == 2)).alias("going"),
        ),
    )["cnt"]
    return F.slice(parts, F.lit(1), F.size(parts) - trailing)


def alltheplaces_types(spark: SparkSession, insights_path: str) -> DataFrame:
    """The ATP spider registry (``hu_alltheplaces.py:227-351``) as one plan:
    insights JSON → one poi_common row per HU-relevant spider.

    Semantics preserved: brand = ``nsi_brand or q_title or ''`` (falsy
    chain, :245); first brand encountered wins per spider (:252-254, dict
    insertion order = data-array order); poi_code = 'huatp_' + spider
    sanitized (strip/lower/-→_/space→_) truncated to 57 (:85-88); a
    post-truncation poi_code collision skips the LATER spider (:305-313);
    poi_type from the keyword cascade (:91-125); common name = brand, else
    the spider minus trailing 2-char segments, each part capitalized, with
    ``spider.title()`` when nothing remains (:128-138); search name =
    brand lowercased, else the same segment-drop over the lowercased
    spider joined by spaces (:319-326)."""
    with open(insights_path, "r", encoding="utf-8") as fh:
        payload = fh.read()
    src = spark.createDataFrame([(payload,)], "js string").select(
        F.from_json("js", _ATP_INSIGHTS_T).alias("j")
    )
    brands = src.select(
        F.posexplode(F.col("j.data")).alias("bpos", "b")
    ).select(
        "bpos",
        F.coalesce(
            F.nullif(F.col("b.nsi_brand"), F.lit("")),
            F.nullif(F.col("b.q_title"), F.lit("")),
            F.lit(""),
        ).alias("brand"),
        F.explode(F.map_keys(F.coalesce(
            F.col("b.atp_splits")["HU"], F.lit(None).cast("map<string,bigint>")
        ))).alias("spider"),
    ).where(F.col("spider") != "")

    from pyspark.sql import Window

    first_per_spider = (
        brands.withColumn(
            "rn", F.row_number().over(Window.partitionBy("spider").orderBy("bpos"))
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    code = F.concat(
        F.lit("huatp_"),
        F.substring(
            F.regexp_replace(F.lower(_strip(F.col("spider"))), r"[- ]", "_"), 1, 57
        ),
    )
    coded = first_per_spider.withColumn("poi_code", code).withColumn(
        "rn", F.row_number().over(Window.partitionBy("poi_code").orderBy("bpos"))
    ).where(F.col("rn") == 1).drop("rn")

    n = F.lower(F.col("spider"))
    ptype = F.lit("shop")
    for keywords, t in reversed(_ATP_TYPE_RULES):
        cond = F.lit(False)
        for k in keywords:
            cond = cond | n.contains(k)
        ptype = F.when(cond, F.lit(t)).otherwise(ptype)

    parts_orig = _drop_trailing_2(F.split(F.col("spider"), "_"))
    common = F.when(F.col("brand") != "", F.col("brand")).otherwise(
        F.when(
            F.size(parts_orig) > 0,
            F.concat_ws(" ", F.transform(parts_orig, _cap)),
        ).otherwise(F.concat_ws("_", F.transform(F.split(F.col("spider"), "_"), _cap)))
    )
    parts_lower = _drop_trailing_2(F.split(n, "_"))
    search = F.when(F.col("brand") != "", F.lower(F.col("brand"))).otherwise(
        F.concat_ws(" ", parts_lower)
    )
    return coded.select(
        F.col("poi_code"),
        common.alias("poi_common_name"),
        ptype.alias("poi_type"),
        search.alias("poi_search_name"),
        F.nullif(F.col("brand"), F.lit("")).alias("brand_tag"),
        F.col("spider"),
    )


_ATP_FEATURES_T = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField(
                            "geometry",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField(
                                        "coordinates", T.ArrayType(T.DoubleType())
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "properties", T.MapType(T.StringType(), T.StringType())
                        ),
                    ]
                )
            ),
        ),
    ]
)


def alltheplaces_pois(
    spark: SparkSession, geojson_path: str, spider_name: str
) -> DataFrame:
    """One ATP spider's GeoJSON → POI-raw rows
    (``hu_alltheplaces.py:467-556`` ``_import_feature`` set-wide).

    Semantics preserved: Point-only features with ≥2 coordinates; HU
    filter = addr:country/@country/country falsy chain against
    {'HU','Hungary','hu'}, bbox fallback lat 45.7–48.6 / lon 16.1–22.9
    (:141-159); name = ``name or brand`` (falsy chain); branch = @spider
    through the clean_branch setter; address preference addr:street (+
    addr:housenumber, original = ``'{} {}'.format(street, hn).strip()`` —
    so a missing housenumber renders ``'X None'``, str.format quirk) over
    addr:street_address/addr:full via the extractor; phone/email chains
    through their setters (phone picks up clean_phone_to_str); website =
    website/contact:website/@source_uri through clean_url; ref =
    ref/@id. The NDJSON fallback for malformed feeds (:425-459) is
    intentionally out of scope (error-path, not a query semantic)."""
    with open(geojson_path, "r", encoding="utf-8") as fh:
        payload = fh.read()
    feats = (
        spark.createDataFrame([(payload,)], "js string")
        .select(F.from_json("js", _ATP_FEATURES_T).alias("j"))
        .select(F.explode("j.features").alias("f"))
        .select(F.col("f.geometry").alias("g"), F.col("f.properties").alias("p"))
        .where(
            (F.col("g.type") == "Point") & (F.size("g.coordinates") >= 2)
        )
    )
    p = F.col("p")

    def chain(*keys):
        return F.coalesce(
            *[F.nullif(p[k], F.lit("")) for k in keys], F.lit("")
        )

    country = chain("addr:country", "@country", "country")
    lat_raw = F.col("g.coordinates")[1]
    lon_raw = F.col("g.coordinates")[0]
    is_hu = F.when(
        country != "", country.isin("HU", "Hungary", "hu")
    ).otherwise(
        lat_raw.between(45.7, 48.6) & lon_raw.between(16.1, 22.9)
    )
    lat, lon = fix_hu_coordinates(lat_raw, lon_raw)

    addr_street = clean_string_udf(p["addr:street"])
    addr_hn = clean_string_udf(p["addr:housenumber"])
    combined = clean_string_udf(chain("addr:street_address", "addr:full"))

    street = F.when(addr_street.isNotNull(), addr_street)
    ex = extract_street_udf(combined)
    street = street.otherwise(F.when(combined.isNotNull(), ex.street))
    hn_val = F.when(addr_street.isNotNull(), addr_hn).otherwise(
        F.when(combined.isNotNull(), ex.housenumber)
    )
    csn = F.when(
        addr_street.isNull() & combined.isNotNull(), ex.conscriptionnumber
    )
    original = F.when(
        addr_street.isNotNull(),
        _strip(F.concat(addr_street, F.lit(" "), F.coalesce(addr_hn, F.lit("None")))),
    ).otherwise(F.when(combined.isNotNull(), combined))

    return feats.where(is_hu).select(
        F.lit(_atp_spider_code(spider_name)).alias("code"),
        lat.alias("lat"),
        lon.alias("lon"),
        clean_string_udf(chain("name", "brand")).alias("name"),
        set_branch_udf(p["@spider"]).alias("branch"),
        clean_string_udf(street).alias("street"),
        set_housenumber_udf(hn_val).alias("housenumber"),
        clean_string_udf(csn).alias("conscriptionnumber"),
        clean_string_udf(original).alias("original"),
        clean_city_udf(chain("addr:city")).alias("city"),
        clean_postcode_udf(chain("addr:postcode")).alias("postcode"),
        clean_phone_udf(clean_string_udf(chain("phone", "contact:phone"))).alias("phone"),
        clean_email_udf(chain("email", "contact:email")).alias("email"),
        clean_url_udf(chain("website", "contact:website", "@source_uri")).alias("website"),
        clean_string_udf(chain("ref", "@id")).alias("ref"),
        clean_string_udf(chain("opening_hours")).alias("opening_hours"),
    )


def _atp_spider_code(spider_name: str) -> str:
    """``_spider_to_poi_code`` (hu_alltheplaces.py:85-88)."""
    sanitised = spider_name.strip().lower().replace("-", "_").replace(" ", "_")
    return "huatp_" + sanitised[:57]


def posta_json_offices(spark: SparkSession, json_path: str) -> DataFrame:
    """The JSON variant of the Posta feed
    (``dataproviders/hu_posta_json.py:71-106``) as one projection.

    Quirks vs the XML provider, preserved: coordinates are taken RAW (no
    check_hu_boundary swap, :99-100); 'posta' type splits on a
    'mobilposta' name substring, and the mobilposta branch never sets
    public_holiday_open (:79-83); unknown types keep code/pho NULL after
    the previous record's clear_all (:94-95); postcode is ``.strip()``
    into the clean_postcode setter (:96); branch is the raw name through
    the clean_branch setter chain (:98)."""
    s = (
        spark.read.option("multiLine", "true")
        .json(json_path)
        .select(F.explode("items").alias("i"))
        .select("i.*")
    )
    t = F.col("type")
    code = (
        F.when(
            t == "posta",
            F.when(F.col("name").contains("mobilposta"), F.lit("hupostamp")).otherwise(
                F.lit("hupostapo")
            ),
        )
        .when(t == "csekkautomata", F.lit("hupostacse"))
        .when(t == "postamachine", F.lit("hupostacso"))
        .when(t == "postapoint", F.lit("hupostapp"))
    )
    pho = (
        F.when(
            t == "posta",
            F.when(F.col("name").contains("mobilposta"), F.lit(None).cast("boolean"))
            .otherwise(F.lit(False)),
        )
        .when(t.isin("csekkautomata", "postamachine"), F.lit(True))
        .when(t == "postapoint", F.lit(False))
    )
    ex = extract_street_udf(F.col("address"))
    return s.select(
        code.alias("code"),
        pho.alias("public_holiday_open"),
        clean_postcode_udf(F.col("zipCode")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        set_branch_udf(F.col("name")).alias("branch"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lng").cast("double").alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address")).alias("original"),
    )


# ---------------------------------------------------------------------------
# Foxpost / Packeta parcel lockers (dataproviders/hu_foxpost.py:129-189)
# ---------------------------------------------------------------------------

# clean_opening_hours's range pattern (address.py:34)
_FOX_OH_RX = r"0*[0-9]{1,2}:0*[0-9]{1,2}\s*-\s*0*[0-9]{1,2}:0*[0-9]{1,2}"

# WeekDaysLongHUUnAccented 0..6 → feed keys (utils/enums.py:56-63)
_FOX_DAYS = [
    ("mo", "hetfo"), ("tu", "kedd"), ("we", "szerda"), ("th", "csutortok"),
    ("fr", "pentek"), ("sa", "szombat"), ("su", "vasarnap"),
]


def _clean_opening_hours_expr(c):
    """``clean_opening_hours`` (address.py:540-555) as pure column exprs:
    regex *search* for the first time range, strip ALL whitespace, split on
    the dash, zfill(5) each half. zfill does not truncate, so a >5-char
    half ('006:30') passes through unchanged — preserved via the
    length-guarded lpad."""
    m = F.regexp_extract(c, _FOX_OH_RX, 0)
    compact = F.regexp_replace(m, r"\s", "")
    halves = F.split(compact, "-")

    def z5(x):
        return F.when(F.length(x) >= 5, x).otherwise(F.lpad(x, 5, "0"))

    ok = c.isNotNull() & (m != F.lit(""))
    return F.when(ok, z5(halves[0])), F.when(ok, z5(halves[1]))


def foxpost_lockers(spark: SparkSession, json_path: str) -> DataFrame:
    """Foxpost/Packeta parcel-locker feed (``dataproviders/hu_foxpost.py:
    129-189``) as one projection. Semantics preserved:

    - falsy ``variant`` → record skipped (:137-139); unknown variant →
      code NULL but the record is still emitted (:147-148 only assigns on
      a map hit, after the previous record's ``clear_all``);
    - missing ``paymentOptions`` → ``len(None)`` TypeError → the
      per-record except swallows the row (:155, :183). The payment tag
      updates themselves mutate ``self.tags`` AFTER ``types()`` has
      registered the per-code tag dicts, so they have no per-row output
      effect — consciously not modeled (:159-163);
    - truthy description containing 'kültéri' → nonstop True and the
      per-day block is skipped; other truthy descriptions read
      ``poi_data['open'][day]`` so a NULL ``open`` object raises and
      drops the row; falsy description skips the block entirely,
      leaving nonstop and all day columns NULL (:165-176);
    - the feed's zip/city fields are DEAD: the trailing waxeye
      tuple-assignment overwrites postcode and city unconditionally —
      postcode through clean_postcode, city through the raw clean_string
      setter (:151-152 vs :178-179, poi_dataset.py:192-204);
    - coordinates go through check_hu_boundary (swap + repoint, :149);
      ref = clean_string(operator_id) (:181); public_holiday_open False.
    """
    s = spark.read.option("multiLine", "true").json(json_path)
    desc = clean_string_udf(F.col("findme"))
    s = s.withColumn("description", desc)
    keep = (
        F.col("variant").isNotNull()
        & (F.col("variant") != "")
        & F.col("paymentOptions").isNotNull()
        & ~(
            F.col("description").isNotNull()
            & ~F.col("description").contains("kültéri")
            & F.col("open").isNull()
        )
    )
    s = s.where(keep)

    vu = F.upper(F.col("variant"))
    code = (
        F.when(vu == "FOXPOST A-BOX", F.lit("hufoxpocso"))
        .when(vu == "FOXPOST Z-BOX", F.lit("hufoxpzcso"))
        .when(vu == "PACKETA Z-PONT", F.lit("hupacketpp"))
        .when(vu == "PACKETA Z-BOX", F.lit("hupackecso"))
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("geolat").cast("double"), F.col("geolng").cast("double")
    )
    is_kulteri = F.col("description").isNotNull() & F.col("description").contains(
        "kültéri"
    )
    use_oh = F.col("description").isNotNull() & ~is_kulteri
    ex = parse_address_udf(F.col("address"))

    day_cols = []
    for d, hu_key in _FOX_DAYS:
        o, c = _clean_opening_hours_expr(F.col("open").getField(hu_key))
        day_cols.append(F.when(use_oh, o).alias(f"{d}_open"))
        day_cols.append(F.when(use_oh, c).alias(f"{d}_close"))

    return s.select(
        code.alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(ex.postcode).alias("postcode"),
        clean_string_udf(ex.city).alias("city"),
        set_branch_udf(F.col("name")).alias("branch"),
        F.col("description"),
        F.when(is_kulteri, F.lit(True)).alias("nonstop"),
        clean_string_udf(F.col("operator_id")).alias("ref"),
        F.lit(False).alias("public_holiday_open"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address")).alias("original"),
        *day_cols,
    )


# ---------------------------------------------------------------------------
# Mobiliti EV chargers (dataproviders/hu_mobiliti_ev.py:49-140)
# ---------------------------------------------------------------------------

_EV_PORT_T = T.StructType(
    [
        T.StructField("plugType", T.StringType()),
        T.StructField("cableAttached", T.BooleanType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("power", T.LongType()),
        T.StructField("current", T.LongType()),
        T.StructField("voltage", T.LongType()),
    ]
)

_EV_REC_T = T.StructType(
    [
        T.StructField("id", T.StringType()),  # numeric feed ids parse to text
        T.StructField("name", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("Cím", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("manufacturer", T.StringType()),
        T.StructField("evses", T.ArrayType(_EV_PORT_T)),
    ]
)

# plug class → exported column prefix (POI_COLS_RAW names)
_EV_CLASS_COLS = {
    "cable": "socket_type2_cable",
    "cableless": "socket_type2_cableless",
    "chademo": "socket_chademo",
    "combo": "socket_type2_combo",
}

_EV_SCAN_SCHEMA = T.StructType(
    [T.StructField("pos", T.IntegerType()), T.StructField("kept", T.BooleanType())]
    + [
        T.StructField(name, typ)
        for prefix in _EV_CLASS_COLS.values()
        for name, typ in (
            (prefix, T.IntegerType()),
            (f"{prefix}_output", T.StringType()),
            (f"{prefix}_current", T.IntegerType()),
            (f"{prefix}_voltage", T.IntegerType()),
        )
    ]
)


def _ev_socket_scan(pdf):
    """The per-record `evses` fold of hu_mobiliti_ev.py:75-129, with the
    reference's cross-record state leak reproduced.

    The provider "re-initializes" every socket field to None per record
    (:75-93), but the numeric setters are GUARDED — ``if clean_string(data)
    is not None`` (poi_dataset.py:399-491) — so assigning None is a no-op:
    only the four *_output string fields actually reset. A record dropped
    by the per-record except (NULL ``evses``, NULL plugType, NULL
    power/current/voltage, or NULL quantity added onto a non-None count)
    never reaches ``add()``'s ``clear_all``, so its accumulated counts,
    currents and voltages LEAK into the next record — counts even keep
    summing (`cable + quantity` reads the leaked value). This is
    inherently sequential mutable state, so it runs as one ordered pandas
    scan; provider feeds are dimension-sized (10^3-10^5 rows), never the
    pages table, so a single-group scan is the honest physical plan.
    """
    import pandas as _pd

    pdf = pdf.sort_values("pos")
    counts = dict.fromkeys(_EV_CLASS_COLS)
    curs = dict.fromkeys(_EV_CLASS_COLS)
    volts = dict.fromkeys(_EV_CLASS_COLS)
    rows = []
    for pos, evses in zip(pdf["pos"], pdf["evses"]):
        outs = dict.fromkeys(_EV_CLASS_COLS)  # the only real per-record reset
        kept = True
        if evses is None:
            kept = False  # `for port in None` → TypeError → record skipped
        else:
            for port in evses:
                t = port.get("plugType")
                if t is None:
                    kept = False  # None.upper() → AttributeError
                    break
                u = t.upper()
                if u == "TYPE2":
                    cls = "cable" if port.get("cableAttached") else "cableless"
                elif u == "CHADEMO":
                    cls = "chademo"
                elif u == "CCS":
                    cls = "combo"
                else:
                    continue  # 'Non processed EV port type.'
                q = port.get("quantity")
                if counts[cls] is None:
                    if q is not None:  # guarded setter: None assign is a no-op
                        counts[cls] = int(q)
                else:
                    if q is None:
                        kept = False  # int + None → TypeError
                        break
                    counts[cls] = counts[cls] + int(q)
                p = port.get("power")
                if p is None:
                    kept = False  # int(None) in the kW format → TypeError
                    break
                outs[cls] = "{0:d} kW".format(int(p) // 1000)
                cur = port.get("current")
                if cur is None:
                    kept = False
                    break
                curs[cls] = int(cur)
                v = port.get("voltage")
                if v is None:
                    kept = False
                    break
                volts[cls] = int(v)
        row = {"pos": pos, "kept": kept}
        for cls, prefix in _EV_CLASS_COLS.items():
            row[prefix] = counts[cls]
            row[f"{prefix}_output"] = outs[cls]
            row[f"{prefix}_current"] = curs[cls]
            row[f"{prefix}_voltage"] = volts[cls]
        rows.append(row)
        if kept:  # add() ran → clear_all resets the private attrs directly
            counts = dict.fromkeys(_EV_CLASS_COLS)
            curs = dict.fromkeys(_EV_CLASS_COLS)
            volts = dict.fromkeys(_EV_CLASS_COLS)
    # object-dtype columns keep int/None as-is (no float64+NaN coercion)
    names = [f.name for f in _EV_SCAN_SCHEMA.fields]
    return _pd.DataFrame(
        {c: _pd.Series([r[c] for r in rows], dtype="object") for c in names},
        columns=names,
    )


def mobiliti_chargers(spark: SparkSession, json_path: str) -> DataFrame:
    """Mobiliti EV-charger feed (``dataproviders/hu_mobiliti_ev.py:49-140``).

    Stateless fields are declarative column exprs / Arrow UDFs; the
    ``evses`` port fold (with its guarded-setter state leak, see
    :func:`_ev_socket_scan`) runs as one ordered applyInPandas scan keyed
    on the record's position in the feed array — the read is
    ``wholetext`` + ``posexplode(from_json(...))`` so the position is an
    explicit column, not an accident of partitioning. Quirks preserved:

    - street/housenumber extraction runs on the FULL address string
      (the reference passes ``address``, not a street substring, so the
      '1013 Budapest, Krisztina körút' prefix stays in the street);
      the preceding extraction from the 'Cím' field is dead — its result
      is immediately overwritten (:67-71);
    - numeric feed ids stringify through clean_string (:60);
    - postcode = clean_string into the clean_postcode setter (:65);
      city = clean_city into the clean_string setter (:66);
    - lat/lon via check_hu_boundary (:73-74); manufacturer raw through
      the clean_string setter (:130); code is constant 'humobilchs'.
    """
    doc = spark.read.text(json_path, wholetext=True)
    recs = doc.select(
        F.posexplode(F.from_json("value", T.ArrayType(_EV_REC_T))).alias("pos", "r")
    ).select("pos", "r.*")

    scan = (
        recs.select("pos", "evses", F.lit(1).alias("g"))
        .groupBy("g")
        .applyInPandas(_ev_socket_scan, schema=_EV_SCAN_SCHEMA)
    )

    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("latitude"), F.col("longitude"))
    ex = extract_street_udf(F.col("address"))
    out = recs.join(F.broadcast(scan), "pos").where(F.col("kept"))
    return out.select(
        F.lit("humobilchs").alias("code"),
        clean_string_udf(F.col("id")).alias("ref"),
        set_branch_udf(F.col("name")).alias("branch"),
        clean_postcode_udf(F.col("postalCode")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_string_udf(F.col("manufacturer")).alias("manufacturer"),
        *[
            F.col(c).alias(c)
            for prefix in _EV_CLASS_COLS.values()
            for c in (prefix, f"{prefix}_output", f"{prefix}_current", f"{prefix}_voltage")
        ],
    )


# ---------------------------------------------------------------------------
# Shell fuel stations (dataproviders/hu_shell.py:50-113)
# ---------------------------------------------------------------------------

_SHELL_REC_T = T.StructType(
    [
        T.StructField("country_code", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("website_url", T.StringType()),
        T.StructField("telephone", T.StringType()),  # numeric ids → text (str())
        T.StructField("amenities", T.ArrayType(T.StringType())),
    ]
)


def _shell_street_expr(c):
    """hu_shell.py:67-70 as pure array exprs: ``address.lower().split()``
    (any-whitespace split, empties dropped like Python's argless split),
    every token EXCEPT THE LAST TWO ``str.capitalize()``d (= upper(first
    char) on an already-lowercased token), re-joined with single spaces."""
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")
    cap = lambda x: F.concat(
        F.upper(x.substr(F.lit(1), F.lit(1))), x.substr(F.lit(2), F.length(x))
    )
    return F.array_join(
        F.transform(
            toks, lambda x, i: F.when(i < F.size(toks) - 2, cap(x)).otherwise(x)
        ),
        " ",
    )


def shell_stations(spark: SparkSession, json_path: str) -> DataFrame:
    """Shell fuel-station feed (``dataproviders/hu_shell.py:50-113``) as one
    fully declarative projection — no sequential state, every cleaner a
    column expr or Arrow UDF. Semantics preserved:

    - non-'HU' ``country_code`` skipped (:59-63); missing ``address``
      (None.lower()) or missing ``amenities`` (``in None``) → the
      per-record except drops the row (:67, :81);
    - the street string is ``address.lower().split()`` with every token
      EXCEPT THE LAST TWO ``str.capitalize()``d, re-joined, then fed to
      extract_street_housenumber_better_2 (:67-70, :87-88) — so a
      two-token address stays all-lowercase ('m1 autópálya');
    - city falls back to the station NAME when the city field is empty,
      both through ``clean_city(x.title())`` (:71-78);
    - empty/absent website_url → literal 'https://shell.hu/' (:65);
      empty postcode/telephone → NULL (:66, :89);
    - 'twenty_four_hour' amenity sets nonstop AND public_holiday_open
      (never False — absent leaves both NULL, :81-83);
    - fuel_octane_95/diesel/octane_100/diesel_gtl unconditionally True
      (:91-94); compressed_air / fuel_adblue (3 amenity aliases) /
      restaurant / food (2 aliases) / truck from amenity membership
      (:95-105); original is the RAW address through the clean_string
      setter (whitespace collapse only, case kept).
    """
    s = (
        spark.read.schema(_SHELL_REC_T)
        .option("multiLine", "true")
        .json(json_path)
        .where(
            (F.col("country_code") == "HU")
            & F.col("address").isNotNull()
            & F.col("amenities").isNotNull()
        )
    )

    ex = extract_street_udf(_shell_street_expr(F.col("address")))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    am = F.col("amenities")
    has = lambda a: F.array_contains(am, a)
    tflag = lambda c: F.when(c, F.lit(True))  # set-True-or-leave-NULL setters
    city_ok = F.col("city").isNotNull() & (F.col("city") != "")
    name_ok = F.col("name").isNotNull() & (F.col("name") != "")

    return s.select(
        F.lit("hushellfu").alias("code"),
        F.when(
            F.col("website_url").isNotNull() & (F.col("website_url") != ""),
            clean_url_udf(F.col("website_url")),
        )
        .otherwise(F.lit("https://shell.hu/"))
        .alias("website"),
        F.when(
            F.col("postcode").isNotNull() & (F.col("postcode") != ""),
            clean_postcode_udf(F.col("postcode")),
        ).alias("postcode"),
        F.when(city_ok, clean_city_title_udf(F.col("city")))
        .otherwise(F.when(name_ok, clean_city_title_udf(F.col("name"))))
        .alias("city"),
        F.when(name_ok, set_branch_udf(F.col("name"))).alias("branch"),
        tflag(has("twenty_four_hour")).alias("nonstop"),
        tflag(has("twenty_four_hour")).alias("public_holiday_open"),
        F.when(
            F.col("address") != "", clean_string_udf(F.col("address"))
        ).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        F.when(
            F.col("telephone").isNotNull() & (F.col("telephone") != ""),
            clean_phone_udf(F.col("telephone")),
        ).alias("phone"),
        F.lit(True).alias("fuel_octane_95"),
        F.lit(True).alias("fuel_diesel"),
        F.lit(True).alias("fuel_octane_100"),
        F.lit(True).alias("fuel_diesel_gtl"),
        tflag(has("air_and_water")).alias("compressed_air"),
        tflag(
            has("adblue_pack") | has("adblue_car") | has("adblue_truck")
        ).alias("fuel_adblue"),
        tflag(has("hot_food")).alias("restaurant"),
        tflag(has("bakery_shop") | has("food_offerings")).alias("food"),
        tflag(has("hgv_lane")).alias("truck"),
    )


# ---------------------------------------------------------------------------
# Fire stations (dataproviders/hu_fire_station.py:94-160)
# ---------------------------------------------------------------------------

_FIRE_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("category", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("address", T.StringType()),
            T.StructField("phone", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
        ]
    )
)


def fire_stations(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Fire-station registry scraped from an HTML page column —
    ``dataproviders/hu_fire_station.py:94-160`` as one plan.

    The station array lives in the first ``<script>`` containing
    'office_Map_data', sliced by the greedy single-line ``(\\[.*\\]);``
    regex (extract/html.extract_script_array). Per-record semantics:

    - category (clean_string'd) maps 1/2/3/5 → HTP/KVŐ/ÖTP/ÖTE codes;
      categories 1/2/3 then call ``.replace`` on the name, so a NULL name
      DROPS those records via the inner ``continue`` (:125-144) — but the
      code was already assigned, and the record never reaches
      ``clear_all``, so the code LEAKS into following records whose own
      category maps to nothing (4/unknown). Category 5 never touches the
      name. The leak is a per-feed carry-forward — expressed here as a
      running added-count segment id + last(ignorenulls) window over the
      feed order, no Python in the plan;
    - the name "assignment" is ``==`` — a comparison, never stored
      (:126, :134, :141) — so no name column is exported;
    - address → waxeye extract_all_address (postcode/city/street/
      housenumber/conscriptionnumber, the city through the raw
      clean_string setter); phone → clean_phone_to_str; email →
      clean_string into the clean_email setter; original = clean_string
      (address); lat/lon via check_hu_boundary (:146-152).
    """
    from ..extract.html import script_array_udf

    payload = script_array_udf(F.col(html_col), F.lit("office_Map_data"))
    recs = (
        pages.select(F.from_json(payload, _FIRE_REC_T).alias("pois"))
        .where(F.col("pois").isNotNull())
        .select(F.posexplode("pois").alias("pos", "p"))
        .select("pos", "p.*")
    )
    cat = clean_string_udf(F.col("category"))
    mapped = (
        F.when(cat == "5", F.lit("hufirevsta"))
        .when(cat == "3", F.lit("hufireusta"))
        .when(cat == "2", F.lit("hufirelsta"))
        .when(cat == "1", F.lit("hufiremsta"))
    )
    dropped = cat.isin("1", "2", "3") & F.col("name").isNull()
    recs = recs.select(
        "pos", "address", "phone", "email", "latitude", "longitude",
        mapped.alias("mapped_code"),
        dropped.alias("dropped"),
    )

    from pyspark.sql import Window

    # feed-order windows: one tiny single-partition feed, never the pages
    # table — the sequential clear_all boundary forces the global order
    w_seg = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    w_code = (
        Window.partitionBy("seg")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = recs.withColumn(
        "seg",
        F.coalesce(
            F.sum(F.when(~F.col("dropped"), 1).otherwise(0)).over(w_seg), F.lit(0)
        ),
    ).withColumn("code", F.last("mapped_code", ignorenulls=True).over(w_code))

    ex = parse_address_udf(F.col("address"))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("latitude"), F.col("longitude"))
    return staged.where(~F.col("dropped")).select(
        F.col("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(ex.postcode).alias("postcode"),
        clean_string_udf(ex.city).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        clean_email_udf(F.col("email")).alias("email"),
        clean_string_udf(F.col("address")).alias("original"),
    )


# ---------------------------------------------------------------------------
# MKB Bank branches + ATMs (dataproviders/hu_mkb_bank.py:62-156)
# ---------------------------------------------------------------------------

_MKB_DAYS = [
    ("mo", "Hétfő"), ("tu", "Kedd"), ("we", "Szerda"), ("th", "Csütörtök"),
    ("fr", "Péntek"), ("sa", "Szombat"), ("su", "Vasárnap"),
]


def mkb_banks(spark: SparkSession, tsv_path: str) -> DataFrame:
    """MKB branch/ATM TSV (``dataproviders/hu_mkb_bank.py:62-156``) as one
    projection over ``spark.read.csv(sep='\\t')``. Semantics preserved:

    - Típus 'FIOKATM' → humkbbank, public_holiday_open False, nonstop
      False + per-day hours; anything else → humkbatm, pho True, nonstop
      True and the day block UNTOUCHED (all NULL) (:73-78, :95-98);
    - the reference reads via pandas, so an empty day cell is NaN —
      ``is not None`` passes and ``str(NaN).strip()`` stores the literal
      'nan' as the day value (:101-150); a whitespace-only cell is the
      only thing the guard actually rejects (→ NULL). Reproduced as
      ``when(cell IS NULL, 'nan') otherwise nullif(strip(cell), '')``.
      The Monday-close guard checks the Monday-OPEN cell (copy-paste bug,
      :104) — indistinguishable from the correct guard on a well-formed
      TSV where every column exists (NaN is never None), so no separate
      branch is modeled;
    - decimal-comma coordinates ``.replace(',', '.')`` — a missing cell
      is NaN and ``.replace`` raises → row dropped (:81-83);
    - description = clean_string(Megjegyzés) then replace_html_newlines;
      an empty Megjegyzés makes that raise (reduce over None) and the
      ``'Akadálymentesen' in description`` probe raises on None too →
      row dropped (:90-92); phone is EXTRACTED from the description text
      (:93); city passes only through the raw clean_string setter — NO
      clean_city (:80).
    """
    s = spark.read.option("sep", "\t").option("header", "true").csv(tsv_path)

    desc = replace_html_newlines_udf(clean_string_udf(s["Megjegyzés"]))
    s = s.withColumn("description", desc).where(
        s["Földrajzi szélesség"].isNotNull()
        & s["Földrajzi hosszúság"].isNotNull()
        & F.col("description").isNotNull()
    )
    is_bank = s["Típus"] == "FIOKATM"
    lat_raw = F.regexp_replace(s["Földrajzi szélesség"], ",", ".").cast("double")
    lon_raw = F.regexp_replace(s["Földrajzi hosszúság"], ",", ".").cast("double")
    lat_fixed, lon_fixed = fix_hu_coordinates(lat_raw, lon_raw)
    ex = extract_street_udf(s["Cím"])

    def day_val(col):
        stripped = _strip(col)
        return F.when(
            is_bank,
            F.when(col.isNull(), F.lit("nan")).otherwise(
                F.when(stripped != "", stripped)
            ),
        )

    return s.select(
        F.when(is_bank, F.lit("humkbbank")).otherwise(F.lit("humkbatm")).alias("code"),
        F.when(is_bank, F.lit(False)).otherwise(F.lit(True)).alias(
            "public_holiday_open"
        ),
        F.when(is_bank, F.lit(False)).otherwise(F.lit(True)).alias("nonstop"),
        clean_postcode_udf(s["Körzetszám"]).alias("postcode"),
        clean_string_udf(s["Város"]).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(s["Cím"]).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_email_udf(s["E-mail cím"]).alias("email"),
        clean_url_udf(s["Időpontfoglalás URL"]).alias("website"),
        clean_string_udf(s["ATM / Fiók azonosítója"]).alias("ref"),
        F.col("description"),
        extract_phone_udf(F.col("description")).alias("phone"),
        *[
            day_val(s[f"{hu_day} {oc}"]).alias(f"{d}_{suffix}")
            for d, hu_day in _MKB_DAYS
            for oc, suffix in (("nyitás", "open"), ("zárás", "close"))
        ],
    )


# ---------------------------------------------------------------------------
# MÁV railway stations (dataproviders/hu_mav.py:55-106)
# ---------------------------------------------------------------------------


def mav_stations(spark: SparkSession, gtfs_zip_path: str) -> DataFrame:
    """MÁV GTFS stops (``dataproviders/hu_mav.py:55-106``) — the provider
    layer over the S14 GTFS source: constant 'humavstart' code,
    name = stop_name.strip() through the clean_string setter,
    poi_additional_ref = clean_string(stop_id), check_hu_boundary
    coordinates, and the formatted ``original`` string
    ``'id={} lat={} lon={} name={}'`` built from the RAW feed values
    (floats render via Python str() — kept in the Arrow UDF for byte
    parity with the reference's ``.format``)."""
    from ..sources.readers import read_gtfs_stops

    stops = read_gtfs_stops(spark, gtfs_zip_path)

    @F.pandas_udf(T.StringType())
    def _mav_original_udf(stop_id, lat, lon, name):
        import pandas as _pd

        def fmt(i, la, lo, n):
            raw = "id={} lat={} lon={} name={}".format(
                i, la if _pd.notna(la) else None, lo if _pd.notna(lo) else None, n
            )
            from ..functions.hu_address import clean_string

            return clean_string(raw)

        return _pd.Series(
            [fmt(*vals) for vals in zip(stop_id, lat, lon, name)], dtype="object"
        )

    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("stop_lat"), F.col("stop_lon"))
    return stops.select(
        F.lit("humavstart").alias("code"),
        clean_string_udf(F.col("stop_name")).alias("name"),
        clean_string_udf(F.col("stop_id")).alias("poi_additional_ref"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        _mav_original_udf(
            F.col("stop_id"), F.col("stop_lat"), F.col("stop_lon"), F.col("stop_name")
        ).alias("original"),
    )


# ---------------------------------------------------------------------------
# GLS parcel lockers / shops (dataproviders/hu_gls.py:75-133)
# ---------------------------------------------------------------------------

_GLS_REC_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("externalId", T.StringType()),
        T.StructField("location", T.ArrayType(T.DoubleType())),
        T.StructField(
            "contact",
            T.StructType(
                [
                    T.StructField("postalCode", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("address", T.StringType()),
                    T.StructField("phone", T.StringType()),
                    T.StructField("email", T.StringType()),
                ]
            ),
        ),
        T.StructField("description", T.StringType()),
        T.StructField("features", T.ArrayType(T.StringType())),
        T.StructField("hours", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)

_GLS_BRANCH_T = T.StructType(
    [
        T.StructField("branch", T.StringType()),
        T.StructField("dropped", T.BooleanType()),
    ]
)


@F.pandas_udf(_GLS_BRANCH_T)
def _gls_branch_udf(names: pd.Series) -> pd.DataFrame:
    """The hu_gls.py:89-93 branch chain WITH the property re-read: every
    assignment passes through the clean_branch setter, and steps 2-4
    re.sub/.replace the PREVIOUS setter output — so a None intermediate
    (empty first '|' segment, or a name the '^GLS automata' sub empties)
    raises and drops the record. Step 5 (clean_string) is None-safe."""
    import re as _re

    import pandas as _pd

    from ..functions import hu_address as _hu

    def chain(name):
        if name is None:
            return (None, True)  # None.split → AttributeError
        b = _hu.clean_branch(_hu.clean_string(name.split("|")[0]))
        if b is None:
            return (None, True)  # re.sub(pattern, '', None) → TypeError
        b = _hu.clean_branch(_re.sub("^GLS automata", "", b, flags=_re.IGNORECASE))
        if b is None:
            return (None, True)
        b = _hu.clean_branch(_re.sub(r"\(.*\)", "", b))
        if b is None:
            return (None, True)  # None.replace → AttributeError
        b = _hu.clean_branch(b.replace("Csak bankkártyás fizetés", ""))
        b = _hu.clean_branch(_hu.clean_string(b))
        return (b, False)

    rows = [chain(n) for n in names]
    return _pd.DataFrame(rows, columns=["branch", "dropped"])


def gls_points(spark: SparkSession, json_path: str) -> DataFrame:
    """GLS parcel-locker/shop feed (``dataproviders/hu_gls.py:75-133``).

    Quirks preserved:

    - the branch chain re-reads the clean_branch setter output between
      regex steps (see :func:`_gls_branch_udf`) — a None intermediate
      drops the record;
    - ``email`` runs through ``clean_phone_to_str`` (copy-paste bug,
      :112) — real e-mail addresses become NULL;
    - the description conditional tests ``len('name'.split('|'))`` — the
      LITERAL string ``'name'`` — which is always 1, so the
      join-the-name-segments branch is dead code and description is
      always ``clean_string(description)`` (:113-114);
    - 'parcel-locker' → huglscso/pho True; 'parcel-shop' → huglspp/pho
      False + name = branch; unknown types keep NULLs (after a clean
      ``clear_all``; records dropped mid-stream overwrite every field the
      next record also writes, so the fixture keeps drop sequences
      leak-free — unlike mobiliti/fire where the leak is the point);
    - ``location`` is a [lat, lon] array — NULL or short arrays raise at
      the index and drop the record (:103-104); NULL ``hours`` raises at
      the loop (:116); per-day values are stored RAW, last entry per
      day-number wins (day_open/day_close assign without cleaning,
      poi_dataset.py:954-958).
    """
    s = (
        spark.read.schema(T.StructType([T.StructField("items", T.ArrayType(_GLS_REC_T))]))
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("items").alias("i"))
        .select("i.*")
    )
    br = _gls_branch_udf(F.col("name"))
    s = s.select("*", br.branch.alias("branch"), br.dropped.alias("br_dropped")).where(
        ~F.col("br_dropped")
        & F.col("location").isNotNull()
        & (F.size("location") >= 2)
        & F.col("hours").isNotNull()
        & F.col("contact").isNotNull()
    )
    t = F.col("type")
    code = F.when(t == "parcel-locker", F.lit("huglscso")).when(
        t == "parcel-shop", F.lit("huglspp")
    )
    pho = F.when(t == "parcel-locker", F.lit(True)).when(
        t == "parcel-shop", F.lit(False)
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("location")[0], F.col("location")[1]
    )
    ex = extract_street_udf(F.col("contact.address"))

    def day_slot(d, idx):
        entry = F.try_element_at(
            F.filter(F.col("hours"), lambda x: x[0] == F.lit(str(d))), F.lit(-1)
        )
        return entry[idx]

    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    return s.select(
        code.alias("code"),
        pho.alias("public_holiday_open"),
        F.col("branch"),
        F.when(t == "parcel-shop", F.col("branch")).alias("name"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("contact.postalCode")).alias("postcode"),
        clean_city_udf(F.col("contact.city")).alias("city"),
        clean_string_udf(F.col("externalId")).alias("ref"),
        clean_string_udf(F.col("contact.address")).alias("original"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("contact.phone")).alias("phone"),
        # hu_gls.py:112 — email through the PHONE cleaner (bug preserved)
        clean_phone_udf(F.col("contact.email")).alias("email"),
        clean_string_udf(F.col("description")).alias("description"),
        *[
            day_slot(d + 1, idx).alias(f"{day_names[d]}_{suffix}")
            for d in range(7)
            for idx, suffix in ((1, "open"), (2, "close"))
        ],
    )


# ---------------------------------------------------------------------------
# MOL fuel stations (dataproviders/hu_mol.py:80-131)
# ---------------------------------------------------------------------------

_MOL_REC_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("services", T.ArrayType(T.StringType())),
        T.StructField(
            "gpsPosition",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("postcode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("address", T.StringType()),
    ]
)


def mol_stations(spark: SparkSession, json_path: str) -> DataFrame:
    """MOL fuel-station feed (``dataproviders/hu_mol.py:80-131``) as one
    declarative projection. Semantics preserved:

    - ``' Sziget '`` (spaces included) in the name → waterway-fuel code;
      else Fresh-Corner-without-SHOP/AD_BLUE/TOLL_TERMINAL → fast-food
      code; else fuel (:90-99). A NULL name or NULL services raises at
      the membership test → record dropped, as does a NULL gpsPosition
      at ``.get`` (:103-104);
    - service booleans are EXPLICIT True/False (``True if ... else
      False``, :108-117) — unlike the Shell provider's set-True-or-NULL;
      fuel 95/diesel/100/GTL and compressed_air unconditionally True;
    - public_holiday_open is assigned True at :107 and then False at
      :123 — last assignment wins, the True is dead;
    - street extraction runs on the feed's street-level address;
      postcode clean_string→clean_postcode setter, city clean_city.
    """
    s = (
        spark.read.schema(T.ArrayType(_MOL_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
        .where(
            F.col("name").isNotNull()
            & F.col("services").isNotNull()
            & F.col("gpsPosition").isNotNull()
        )
    )
    sv = F.col("services")
    has = lambda a: F.array_contains(sv, a)
    code = F.when(F.col("name").contains(" Sziget "), F.lit("humolwfu")).otherwise(
        F.when(
            has("FRESH_CORNER")
            & ~(has("SHOP") | has("AD_BLUE") | has("TOLL_TERMINAL")),
            F.lit("humolfaf"),
        ).otherwise(F.lit("humolfu"))
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("gpsPosition.latitude"), F.col("gpsPosition.longitude")
    )
    ex = extract_street_udf(F.col("address"))
    return s.select(
        code.alias("code"),
        clean_postcode_udf(F.col("postcode")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_string_udf(F.col("address")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        # :107 sets True, :123 overwrites with False — last wins
        F.lit(False).alias("public_holiday_open"),
        has("TRUCK_PARK").alias("truck"),
        has("FRESH_CORNER").alias("food"),
        has("CYLINDER_PB_GAS").alias("rent_lpg_bottles"),
        has("AD_BLUE").alias("fuel_adblue"),
        has("LPG").alias("fuel_lpg"),
        F.lit(True).alias("fuel_octane_95"),
        F.lit(True).alias("fuel_diesel"),
        F.lit(True).alias("fuel_octane_100"),
        F.lit(True).alias("fuel_diesel_gtl"),
        F.lit(True).alias("compressed_air"),
    )


# ---------------------------------------------------------------------------
# K&H Bank branches / ATMs (dataproviders/hu_kh_bank.py:55-90)
# ---------------------------------------------------------------------------

_KH_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
            T.StructField("address", T.StringType()),
            T.StructField("phone", T.StringType()),
        ]
    )
)


@F.pandas_udf(_KH_REC_T)
def _kh_extract_udf(docs: pd.Series) -> pd.Series:
    """hu_kh_bank.py:61-81 — each result object's payload lives under a
    PER-RECORD-VARYING first key (``next(iter(poi_data))``, i.e. the
    first key in JSON document order), with ``phoneNumber`` as a sibling.
    There is NO per-record except: any record error (missing latitude/
    longitude/address key, non-dict payload) escapes the loop and the
    insert never runs — the whole feed yields ZERO rows (all-or-nothing).
    Python json preserves document key order, so this extraction is a
    pandas UDF, not a from_json map."""
    import json as _json

    def one(txt):
        if txt is None:
            return None
        try:
            recs = []
            for poi in _json.loads(txt).get("results"):
                first = next(iter(poi))
                payload = poi.get(first)
                recs.append(
                    (
                        float(payload["latitude"]),
                        float(payload["longitude"]),
                        payload["address"],
                        poi.get("phoneNumber"),
                    )
                )
            return recs
        except Exception:
            return None  # abort-on-error: the entire feed is lost

    return pd.Series([one(t) for t in docs], dtype="object")


def kh_bank_pois(
    spark: SparkSession, json_path: str, provider_name: str = "K&H Bank"
) -> DataFrame:
    """K&H branch/ATM feed (``dataproviders/hu_kh_bank.py:55-90``). The
    module runs as TWO provider instances distinguished only by
    ``self.name`` (:63-68) — ``provider_name`` selects the variant:
    'K&H Bank' → hukhbank/pho False/nonstop False, 'K&H Bank ATM' →
    hukhatm/pho True/nonstop True; any other name leaves code/pho NULL
    (and nonstop False via the ``== 'hukhatm'`` else). The address block
    is GUARDED: a blank address leaves postcode/city/street/housenumber/
    conscriptionnumber/original NULL rather than overwriting (:75-79 —
    the one provider that checks before assigning). Dynamic-first-key
    payload extraction and the all-or-nothing error semantics live in
    :func:`_kh_extract_udf`."""
    doc = spark.read.text(json_path, wholetext=True)
    recs = doc.select(
        F.explode(_kh_extract_udf(F.col("value"))).alias("r")
    ).select("r.*")

    if provider_name == "K&H Bank":
        code, pho = F.lit("hukhbank"), F.lit(False)
    elif provider_name == "K&H Bank ATM":
        code, pho = F.lit("hukhatm"), F.lit(True)
    else:
        code = F.lit(None).cast("string")
        pho = F.lit(None).cast("boolean")
    nonstop = F.lit(provider_name == "K&H Bank ATM")

    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lon"))
    addr_ok = clean_string_udf(F.col("address")).isNotNull()
    ex = parse_address_udf(F.col("address"))
    return recs.select(
        code.alias("code"),
        pho.alias("public_holiday_open"),
        nonstop.alias("nonstop"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        F.when(addr_ok, clean_postcode_udf(ex.postcode)).alias("postcode"),
        F.when(addr_ok, clean_string_udf(ex.city)).alias("city"),
        F.when(addr_ok, ex.street).alias("street"),
        F.when(addr_ok, set_housenumber_udf(ex.housenumber)).alias("housenumber"),
        F.when(addr_ok, ex.conscriptionnumber).alias("conscriptionnumber"),
        F.when(addr_ok, clean_string_udf(F.col("address"))).alias("original"),
        clean_phone_udf(F.col("phone")).alias("phone"),
    )


# ---------------------------------------------------------------------------
# ALDI stores (dataproviders/hu_aldi.py:54-98)
# ---------------------------------------------------------------------------

_ALDI_REC_T = T.StructType(
    [
        T.StructField("countryCode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("streetAddress", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("phoneNumber", T.StringType()),
        T.StructField(
            "openUntilSorted",
            T.StructType(
                [
                    T.StructField(
                        "openingHours",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("dayIdx", T.IntegerType()),
                                    T.StructField("open", T.StringType()),
                                    T.StructField("close", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

# hu_aldi.py:77-85 — outer day loop i=0..6 probes dayIdx mi=i+1, except
# i=6 where `if mi > 6: mi -= 7` folds 7 → 0 (Sunday's feed index)
_ALDI_DAY_IDX = [1, 2, 3, 4, 5, 6, 0]


def aldi_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """ALDI store feed (``dataproviders/hu_aldi.py:54-98``). Quirks:

    - the feed is an OBJECT; records are under ``text.get('stores')``
      (:62) — a missing/null ``stores`` key yields zero rows (outer
      except swallows the TypeError);
    - non-'HU' countryCode silently skipped (:64); NULL ``openUntilSorted``
      or NULL ``openingHours`` raises in the day loop → record dropped;
    - the day probe maps Mo..Sa to dayIdx 1..6 and Su to 0 (the
      ``mi -= 7`` fold), and ``break``s on the FIRST matching entry —
      first-match-wins, raw values (day_open stores uncleaned, :77-85);
    - city is the RAW feed value through the clean_string setter (NOT
      clean_city, :68); name never set.
    """
    s = (
        spark.read.schema(
            T.StructType([T.StructField("stores", T.ArrayType(_ALDI_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("stores").alias("s"))
        .select("s.*")
        .where(
            (F.col("countryCode") == "HU")
            & F.col("openUntilSorted").isNotNull()
            & F.col("openUntilSorted.openingHours").isNotNull()
        )
    )
    oh = F.col("openUntilSorted.openingHours")
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("latitude"), F.col("longitude"))
    ex = extract_street_udf(F.col("streetAddress"))

    def day_slot(feed_idx, field):
        first = F.try_element_at(
            F.filter(oh, lambda x: x.dayIdx == F.lit(feed_idx)), F.lit(1)
        )
        return first[field]

    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    return s.select(
        F.lit("hualdisup").alias("code"),
        clean_string_udf(F.col("city")).alias("city"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_postcode_udf(F.col("postalCode")).alias("postcode"),
        clean_string_udf(F.col("streetAddress")).alias("original"),
        F.lit(False).alias("public_holiday_open"),
        # :76 assigns clean_string(...) but the POIDatasetRaw.phone
        # SETTER applies clean_phone_to_str on top (poi_dataset.py:651)
        clean_phone_udf(clean_string_udf(F.col("phoneNumber"))).alias("phone"),
        *[
            day_slot(_ALDI_DAY_IDX[i], field).alias(f"{day_names[i]}_{suffix}")
            for i in range(7)
            for field, suffix in (("open", "open"), ("close", "close"))
        ],
    )


# ---------------------------------------------------------------------------
# dm drogerie markt (dataproviders/hu_dm.py:50-97)
# ---------------------------------------------------------------------------

_DM_REC_T = T.StructType(
    [
        T.StructField("localeCountry", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("zip", T.StringType()),
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                ]
            ),
        ),
        T.StructField("storeUrlPath", T.StringType()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("phone", T.StringType()),
        T.StructField("storeNumber", T.StringType()),
        T.StructField(
            "openingHours",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("weekDay", T.IntegerType()),
                        T.StructField(
                            "timeRanges",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("opening", T.StringType()),
                                        T.StructField("closing", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

_DM_ACC_FIELDS = ["aborted", "dropped"] + [
    f"d{j}{oc}" for j in range(1, 8) for oc in ("o", "c")
]
_DM_ACC_T = ", ".join(
    f"{f} {'boolean' if f in ('aborted', 'dropped') else 'string'}"
    for f in _DM_ACC_FIELDS
)


def _dm_hours_fold():
    """hu_dm.py:76-87 as one ``aggregate`` fold over ``openingHours``.

    The reference's inner try catches ONLY IndexError/KeyError: an entry
    with an EMPTY timeRanges raises IndexError at ``[0]`` → the hours
    loop ABORTS but the record is still added with the days set so far;
    an entry with NULL timeRanges raises TypeError → uncaught → the
    whole record drops. Entries with weekDay outside 1..7 are skipped
    without touching timeRanges. Later same-day entries overwrite
    earlier ones (no break)."""
    zero = F.expr(
        "named_struct("
        + ", ".join(
            f"'{f}', " + ("false" if f in ("aborted", "dropped") else "cast(null as string)")
            for f in _DM_ACC_FIELDS
        )
        + ")"
    )

    def merge(acc, e):
        valid = e.weekDay.isNotNull() & (e.weekDay >= 1) & (e.weekDay <= 7)
        halted = acc.aborted | acc.dropped
        tr_null = e.timeRanges.isNull()
        tr_empty = F.size(e.timeRanges) == 0
        first = e.timeRanges[0]

        def field(f):
            if f == "aborted":
                return (acc.aborted | (valid & ~tr_null & tr_empty)).alias(f)
            if f == "dropped":
                return (acc.dropped | (valid & tr_null)).alias(f)
            j = int(f[1])
            oc = "opening" if f.endswith("o") else "closing"
            hit = valid & ~tr_null & ~tr_empty & (e.weekDay == j)
            return F.when(hit, first[oc]).otherwise(acc[f]).alias(f)

        return F.when(halted, acc).otherwise(
            F.struct(*[field(f) for f in _DM_ACC_FIELDS])
        )

    return F.aggregate(
        F.coalesce(F.col("openingHours"), F.array()), zero, merge
    )


def dm_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """dm store feed (``dataproviders/hu_dm.py:50-97``). Quirks preserved:

    - ``localeCountry.strip().upper() == 'HU'`` — a NULL raises → drop
      (:58); NULL address/location structs raise at subscripts → drop;
      NULL storeNumber raises at ``.strip()`` → drop (:75);
    - street extraction runs on ``address.street.split(',')[0].title()``
      — Python title(), kept as a pandas UDF (:61-73);
    - website = ``'https://www.dm.hu{}'.format(clean_string(...))`` —
      a NULL path renders the literal 'None' (str.format, :65-66);
    - the hours fold (see :func:`_dm_hours_fold`): empty timeRanges
      aborts the loop keeping prior days (record still added), NULL
      timeRanges drops the record, out-of-range weekDays are skipped.
    """
    s = (
        spark.read.schema(T.ArrayType(_DM_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
        .where(
            F.col("localeCountry").isNotNull()
            & (F.upper(_strip(F.col("localeCountry"))) == "HU")
            & F.col("address").isNotNull()
            & F.col("address.street").isNotNull()
            & F.col("location").isNotNull()
            & F.col("storeNumber").isNotNull()
        )
        .withColumn("_oh", _dm_hours_fold())
        .where(~F.col("_oh.dropped"))
    )
    street_tmp = F.split(F.col("address.street"), ",").getItem(0)
    ex = extract_street_udf(title_udf(street_tmp))
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("location.lat"), F.col("location.lon")
    )
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    return s.select(
        F.lit("hudmche").alias("code"),
        clean_postcode_udf(F.col("address.zip")).alias("postcode"),
        clean_city_udf(F.col("address.city")).alias("city"),
        F.concat(
            F.lit("https://www.dm.hu"),
            F.coalesce(clean_string_udf(F.col("storeUrlPath")), F.lit("None")),
        ).alias("website"),
        clean_string_udf(F.col("address.street")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        clean_string_udf(F.col("storeNumber")).alias("ref"),
        F.lit(False).alias("public_holiday_open"),
        *[
            F.col(f"_oh.d{j + 1}{oc}").alias(f"{day_names[j]}_{suffix}")
            for j in range(7)
            for oc, suffix in (("o", "open"), ("c", "close"))
        ],
    )


# ---------------------------------------------------------------------------
# Penny Market (dataproviders/hu_penny_market.py:52-82)
# ---------------------------------------------------------------------------

_PENNY_REC_T = T.StructType(
    [
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("zip", T.StringType()),
                    T.StructField("street", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("phone", T.StringType()),
        T.StructField("id", T.StringType()),
    ]
)


def penny_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Penny Market feed (``dataproviders/hu_penny_market.py:52-82``):
    street = ``clean_string(street.split(',')[0]).title()`` into
    extract_street_housenumber_better_2 — a street whose first segment
    clean_strings to None raises at ``.title()`` and drops the record
    (:64, :69-70); NULL address struct or NULL street raise at the
    subscripts → dropped; numeric feed ids stringify; pho False."""
    s = (
        spark.read.schema(T.ArrayType(_PENNY_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
    )
    street_first = clean_string_udf(F.split(F.col("address.street"), ",").getItem(0))
    s = s.where(
        F.col("address").isNotNull()
        & F.col("address.street").isNotNull()
        & street_first.isNotNull()
    )
    ex = extract_street_udf(title_udf(street_first))
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("address.latitude"), F.col("address.longitude")
    )
    return s.select(
        F.lit("hupennysup").alias("code"),
        clean_postcode_udf(F.col("address.zip")).alias("postcode"),
        clean_city_udf(F.col("address.city")).alias("city"),
        clean_string_udf(F.col("address.street")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        clean_string_udf(F.col("id")).alias("ref"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# Pepco (dataproviders/hu_pepco.py:52-103)
# ---------------------------------------------------------------------------

_PEPCO_REC_T = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField(
            "coordinates",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lng", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("streetAddress", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("phoneNumber", T.StringType()),
        T.StructField("openingHours", T.StringType()),
    ]
)


def pepco_stores(
    spark: SparkSession, json_path: str, admin_cities: DataFrame | None = None
) -> DataFrame:
    """Pepco feed (``dataproviders/hu_pepco.py:52-103``). The European
    feed is limited to Hungary by an EXACT-name lookup of the raw city
    value against admin_level='8' polygons (query_osm_city_name,
    libs/osm.py:112-126) — here a broadcast semi-join against
    ``admin_cities(name)``; empty or unknown cities drop (:68-74).
    ``admin_cities=None`` degrades to keeping all non-empty cities
    (documented: no dimension available). The opening-hours block is
    DEAD CODE faithfully preserved: ``if i in opening`` probes INT keys
    against the JSON object's STRING keys (or a list's dict values), so
    no day is ever set — but a missing/NULL ``openingHours`` still
    raises (KeyError / ``in None``) and drops the record (:88-92).
    NULL coordinates raise at the subscript → dropped; pho False.
    The feed is an OBJECT; records sit under ``text.get('data')``
    (:60) — missing/null ``data`` yields zero rows."""
    s = (
        spark.read.schema(
            T.StructType([T.StructField("data", T.ArrayType(_PEPCO_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("data").alias("s"))
        .select("s.*")
        .where(
            F.col("city").isNotNull()
            & (F.col("city") != "")
            & F.col("coordinates").isNotNull()
            & F.col("openingHours").isNotNull()
        )
    )
    if admin_cities is not None:
        s = s.join(
            F.broadcast(admin_cities.select(F.col("name").alias("city"))),
            "city",
            "left_semi",
        )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("coordinates.lat"), F.col("coordinates.lng")
    )
    ex = extract_street_udf(F.col("streetAddress"))
    return s.select(
        F.lit("hupepcoclo").alias("code"),
        clean_city_udf(F.col("city")).alias("city"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("streetAddress")).alias("original"),
        clean_postcode_udf(F.col("postalCode")).alias("postcode"),
        clean_phone_udf(F.col("phoneNumber")).alias("phone"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# OBI (dataproviders/hu_obi.py:47-78)
# ---------------------------------------------------------------------------

_OBI_REC_T = T.StructType(
    [
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("zip", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("street", T.StringType()),
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("phone", T.StringType()),
        T.StructField("storeNumber", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("path", T.StringType()),
    ]
)


def obi_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """OBI feed (``dataproviders/hu_obi.py:47-78``): zip ``.strip()``
    raises on NULL → record dropped (:56); phone and website are
    present-and-non-empty guarded (:63-68); email through clean_email;
    no day parsing (the reference's TODO)."""
    s = (
        spark.read.schema(
            T.StructType([T.StructField("stores", T.ArrayType(_OBI_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("stores").alias("s"))
        .select("s.*")
        .where(F.col("address").isNotNull() & F.col("address.zip").isNotNull())
    )
    ex = extract_street_udf(F.col("address.street"))
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("address.lat"), F.col("address.lon")
    )
    return s.select(
        F.lit("huobidiy").alias("code"),
        clean_postcode_udf(F.col("address.zip")).alias("postcode"),
        clean_city_udf(F.col("address.city")).alias("city"),
        clean_string_udf(F.col("address.street")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        F.when(
            F.col("phone").isNotNull() & (F.col("phone") != ""),
            clean_phone_udf(F.col("phone")),
        ).alias("phone"),
        clean_string_udf(F.col("storeNumber")).alias("ref"),
        clean_email_udf(F.col("email")).alias("email"),
        F.when(
            F.col("path").isNotNull() & (F.col("path") != ""),
            clean_url_udf(F.col("path")),
        ).alias("website"),
    )


# ---------------------------------------------------------------------------
# Ofotért (dataproviders/hu_ofotert.py:54-87)
# ---------------------------------------------------------------------------

_OFO_REC_T = T.StructType(
    [
        T.StructField("geo_lat", T.DoubleType()),
        T.StructField("geo_lng", T.DoubleType()),
        T.StructField("address_zip", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("address_city", T.StringType()),
        T.StructField("address_street", T.StringType()),
        T.StructField("phone_numbers", T.StringType()),
        T.StructField("opening_times", T.ArrayType(T.StringType())),
        T.StructField("gv_id", T.StringType()),
    ]
)


def ofotert_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Ofotért feed (``dataproviders/hu_ofotert.py:54-87``). The day loop
    sits in its own try (:71-80): a NULL ``opening_times`` (subscript
    raises at i=0), a short array (IndexError mid-loop), or a NULL
    element (regex .search(None)) ABORTS the loop keeping the days set
    so far — the record is always added. The vacuous guard at :73-74
    (``clean_opening_hours(...) is not None and != ''`` — it returns a
    TUPLE, never None/'') is always true, so every reachable day is
    assigned, possibly (None, None). Phone through clean_string, not the
    phone formatter (:69)."""
    s = (
        spark.read.schema(T.StructType([T.StructField("stores", T.ArrayType(_OFO_REC_T))]))
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("stores").alias("s"))
        .select("s.*")
    )
    arr = F.coalesce(F.col("opening_times"), F.array())
    first_null = F.array_position(
        F.transform(arr, lambda x: x.isNull()), F.lit(True)
    )
    effective = F.when(first_null > 0, first_null - 1).otherwise(F.size(arr))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("geo_lat"), F.col("geo_lng"))
    ex = extract_street_udf(F.col("address_street"))
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    day_cols = []
    for i, d in enumerate(day_names):
        o, c = _clean_opening_hours_expr(arr[i])
        reach = F.lit(i) < effective
        day_cols.append(F.when(reach, o).alias(f"{d}_open"))
        day_cols.append(F.when(reach, c).alias(f"{d}_close"))
    return s.select(
        F.lit("huofoteopt").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("address_zip")).alias("postcode"),
        set_branch_udf(F.col("name")).alias("branch"),
        clean_city_udf(F.col("address_city")).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        # phone setter applies clean_phone_to_str (poi_dataset.py:651)
        clean_phone_udf(clean_string_udf(F.col("phone_numbers"))).alias("phone"),
        clean_string_udf(F.col("address_street")).alias("original"),
        F.lit(False).alias("public_holiday_open"),
        clean_string_udf(F.col("gv_id")).alias("ref"),
        *day_cols,
    )


# ---------------------------------------------------------------------------
# OIL! fuel stations (dataproviders/hu_oil.py:51-81)
# ---------------------------------------------------------------------------

_OIL_REC_T = T.StructType(
    [
        T.StructField("zip", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("address", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("store", T.StringType()),
    ]
)


def oil_stations(spark: SparkSession, json_path: str) -> DataFrame:
    """OIL! feed (``dataproviders/hu_oil.py:51-81``). The famous branch
    bug preserved: ``clean_string(store.split(' ', 1))`` receives a LIST,
    stringifies it to its repr, and ``tmp[1]`` then indexes the SECOND
    CHARACTER of that repr — always the quote — so branch is the literal
    ``'`` for every record (:75-76, verified against the reference
    functions). NULL store or NULL id (.strip()) drop the record;
    website is the RAW .strip()'d url (no clean_url) with a literal
    default (:70-74); only fuel 95/diesel set."""
    s = (
        spark.read.schema(T.ArrayType(_OIL_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
        .where(F.col("store").isNotNull() & F.col("id").isNotNull())
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    ex = extract_street_udf(F.col("address"))
    return s.select(
        F.lit("huoilfu").alias("code"),
        clean_postcode_udf(F.col("zip")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_string_udf(F.col("address")).alias("original"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        F.lit(True).alias("fuel_octane_95"),
        F.lit(True).alias("fuel_diesel"),
        clean_string_udf(F.col("id")).alias("ref"),
        F.when(
            F.col("url").isNotNull() & (F.col("url") != ""), _strip(F.col("url"))
        )
        .otherwise(F.lit("https://www.oil-benzinkutak.hu"))
        .alias("website"),
        F.lit("'").alias("branch"),
    )


# ---------------------------------------------------------------------------
# OMV fuel stations (dataproviders/hu_omv.py:57-98)
# ---------------------------------------------------------------------------

_OMV_REC_T = T.StructType(
    [
        T.StructField("postcode", T.StringType()),
        T.StructField("town_l", T.StringType()),
        T.StructField("open_hours", T.StringType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("address_l", T.StringType()),
        T.StructField("telnr", T.StringType()),
    ]
)


def omv_stations(spark: SparkSession, json_path: str) -> DataFrame:
    """OMV feed (``dataproviders/hu_omv.py:57-98``): ONE ``open_hours``
    range fans out to all seven days; exactly '00:00'-'24:00' flips to
    nonstop + public_holiday_open True with the day columns NULLed
    (:68-82); coordinates arrive as (y, x) = (lat, lon); unconditional
    fuel/compressed-air True family."""
    s = (
        spark.read.schema(T.ArrayType(_OMV_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
    )
    o, c = _clean_opening_hours_expr(F.col("open_hours"))
    has_oh = F.col("open_hours").isNotNull()
    is_nonstop = has_oh & (o == "00:00") & (c == "24:00")
    day_o = F.when(has_oh & ~is_nonstop, o)
    day_c = F.when(has_oh & ~is_nonstop, c)
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("y"), F.col("x"))
    ex = extract_street_udf(F.col("address_l"))
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    return s.select(
        F.lit("huomvfu").alias("code"),
        clean_postcode_udf(F.col("postcode")).alias("postcode"),
        clean_city_udf(F.col("town_l")).alias("city"),
        F.when(is_nonstop, F.lit(True)).alias("nonstop"),
        F.when(is_nonstop, F.lit(True)).otherwise(F.lit(False)).alias(
            "public_holiday_open"
        ),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_string_udf(F.col("address_l")).alias("original"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("telnr")).alias("phone"),
        F.lit(True).alias("fuel_octane_95"),
        F.lit(True).alias("fuel_diesel"),
        F.lit(True).alias("fuel_octane_100"),
        F.lit(True).alias("fuel_diesel_gtl"),
        F.lit(True).alias("compressed_air"),
        *[
            col.alias(f"{d}_{suffix}")
            for d in day_names
            for col, suffix in ((day_o, "open"), (day_c, "close"))
        ],
    )


# ---------------------------------------------------------------------------
# Kulcs patika pharmacies (dataproviders/hu_kulcs_patika.py:49-79)
# ---------------------------------------------------------------------------

_KULCS_REC_T = T.StructType(
    [
        T.StructField(
            "poi",
            T.StructType(
                [
                    T.StructField("patika", T.StringType()),
                    T.StructField("phone", T.StringType()),
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                    T.StructField("address", T.StringType()),
                ]
            ),
        )
    ]
)


def kulcs_patika_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Kulcs patika feed (``dataproviders/hu_kulcs_patika.py:49-79``).
    ``poi_data_poi = poi_data.get('poi')`` (:59) sits outside the
    per-record try but ``.get`` on a *dict* never raises — a record
    with ``"poi": null`` only blows up INSIDE the try at
    ``poi_data_poi.get('patika')`` (:61) and is caught, dropping just
    that record. The loop only aborts (outer except) when a list
    element is itself null/non-dict, so ``poi_data.get`` raises
    outside the try: that truncation is a min-position window over
    elements whose struct failed to parse (``from_json`` yields a
    NULL struct for null / non-object elements). Inside the try: a
    name NOT containing 'Kulcs patika' goes to the ``name`` column
    with branch explicitly None, otherwise to ``branch`` with name
    unset; a NULL ``patika`` (``in None`` TypeError) drops just that
    record (:61-65); waxeye address split; pho False."""
    doc = spark.read.text(json_path, wholetext=True)
    recs = doc.select(
        F.posexplode(
            F.from_json(
                "value",
                T.StructType(
                    [T.StructField("patikaIdList", T.ArrayType(_KULCS_REC_T))]
                ),
            ).getField("patikaIdList")
        ).alias("pos", "r")
    ).select(
        "pos",
        "r.poi.*",
        F.col("r").isNull().alias("rec_null"),
        F.col("r.poi").isNull().alias("poi_null"),
    )

    from pyspark.sql import Window

    # INTENTIONAL single-partition window: one provider feed = one small
    # document whose DOCUMENT ORDER is the semantics (the reference's
    # sequential loop truncates at the first null record). Never copy
    # this shape to a corpus-scale plan — use plans/export.py
    # global_row_number / global_rank_by there.
    cutoff = F.min(F.when(F.col("rec_null"), F.col("pos"))).over(
        Window.partitionBy()
    )
    recs = recs.withColumn("cutoff", cutoff).where(
        (F.col("cutoff").isNull() | (F.col("pos") < F.col("cutoff")))
        & ~F.col("poi_null")
        & F.col("patika").isNotNull()
    )
    is_kulcs = F.col("patika").contains("Kulcs patika")
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("latitude"), F.col("longitude"))
    ex = parse_address_udf(F.col("address"))
    return recs.select(
        F.lit("hukulcspha").alias("code"),
        F.when(~is_kulcs, clean_string_udf(F.col("patika"))).alias("name"),
        F.when(is_kulcs, set_branch_udf(F.col("patika"))).alias("branch"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(ex.postcode).alias("postcode"),
        clean_string_udf(ex.city).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# Deichmann (dataproviders/hu_deichmann.py:58-99)
# ---------------------------------------------------------------------------

_DEICH_DAY_T = T.StructType(
    [
        T.StructField(
            "openingTime",
            T.StructType([T.StructField("formattedHour", T.StringType())]),
        ),
        T.StructField(
            "closingTime",
            T.StructType([T.StructField("formattedHour", T.StringType())]),
        ),
    ]
)

_DEICH_REC_T = T.StructType(
    [
        T.StructField(
            "geoPoint",
            T.StructType(
                [
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("postalCode", T.StringType()),
                    T.StructField("town", T.StringType()),
                    T.StructField("line1", T.StringType()),
                    T.StructField("line2", T.StringType()),
                    T.StructField("phone", T.StringType()),
                    T.StructField("appartment", T.StringType()),
                ]
            ),
        ),
        T.StructField("street", T.StringType()),
        T.StructField(
            "openingHours",
            T.StructType(
                [T.StructField("weekDayOpeningList", T.ArrayType(_DEICH_DAY_T))]
            ),
        ),
        T.StructField("name", T.StringType()),
    ]
)


def deichmann_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Deichmann feed (``dataproviders/hu_deichmann.py:58-99``). Quirks:

    - street = clean_street(address.line1) RAW — no better_2 extraction;
      housenumber = address.line2 through the setter; branch =
      address.appartment; ref = the NAME field (:73-74, :89-91);
    - ``original`` reads the TOP-LEVEL 'street' key, not the address
      (:76) — typically NULL;
    - the day loop is double-try'd (:77-87): ANY error (NULL
      openingHours/list/short list/NULL openingTime or closingTime)
      aborts keeping the days set so far, record always added. Each
      day's opening AND closing are computed before assignment, so a
      NULL closingTime leaves that day fully unset."""
    s = (
        spark.read.schema(T.StructType([T.StructField("shops", T.ArrayType(_DEICH_REC_T))]))
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("shops").alias("s"))
        .select("s.*")
        .where(F.col("geoPoint").isNotNull() & F.col("address").isNotNull())
    )
    wl = F.col("openingHours.weekDayOpeningList")
    arr = F.coalesce(wl, F.array())
    # first index whose entry would raise (NULL entry / NULL opening or
    # closing struct) — days at or past it stay NULL
    bad = F.array_position(
        F.transform(
            arr,
            lambda x: x.isNull()
            | x.openingTime.isNull()
            | x.closingTime.isNull(),
        ),
        F.lit(True),
    )
    effective = F.when(F.col("openingHours").isNull() | wl.isNull(), F.lit(0)).otherwise(
        F.when(bad > 0, bad - 1).otherwise(F.size(arr))
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("geoPoint.latitude"), F.col("geoPoint.longitude")
    )
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    day_cols = []
    for i, d in enumerate(day_names):
        reach = F.lit(i) < effective
        day_cols.append(
            F.when(reach, arr[i].openingTime.formattedHour).alias(f"{d}_open")
        )
        day_cols.append(
            F.when(reach, arr[i].closingTime.formattedHour).alias(f"{d}_close")
        )
    return s.select(
        F.lit("hudeichsho").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("address.postalCode")).alias("postcode"),
        clean_city_udf(F.col("address.town")).alias("city"),
        clean_street_udf(F.col("address.line1")).alias("street"),
        set_housenumber_udf(F.col("address.line2")).alias("housenumber"),
        # phone setter applies clean_phone_to_str (poi_dataset.py:651)
        clean_phone_udf(clean_string_udf(F.col("address.phone"))).alias("phone"),
        clean_string_udf(F.col("street")).alias("original"),
        set_branch_udf(F.col("address.appartment")).alias("branch"),
        F.lit(False).alias("public_holiday_open"),
        clean_string_udf(F.col("name")).alias("ref"),
        *day_cols,
    )


# ---------------------------------------------------------------------------
# Yves Rocher (dataproviders/hu_yves_rocher.py:52-90)
# ---------------------------------------------------------------------------

_YVES_REC_T = T.StructType(
    [
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("hours", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("mobile", T.StringType()),
    ]
)


def yves_rocher_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Yves Rocher feed (``dataproviders/hu_yves_rocher.py:52-90``): the
    same dead day probe as pepco (int keys vs the JSON object's string
    keys — no day is ever set, NULL ``hours`` still drops the record at
    ``in None``); phone and mobile combine with ';' when both present,
    mobile alone becomes the phone (:78-88); postcode raw through the
    clean_postcode setter; website explicitly None."""
    s = (
        spark.read.schema(T.StructType([T.StructField("list", T.ArrayType(_YVES_REC_T))]))
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("list").alias("s"))
        .select("s.*")
        .where(F.col("hours").isNotNull())
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("latitude"), F.col("longitude"))
    ex = extract_street_udf(F.col("address"))
    phone_ok = F.col("phone").isNotNull() & (F.col("phone") != "")
    mobile_ok = F.col("mobile").isNotNull() & (F.col("mobile") != "")
    p = F.when(phone_ok, clean_phone_udf(F.col("phone")))
    m = clean_phone_udf(F.col("mobile"))
    combined = (
        F.when(mobile_ok & p.isNotNull(), F.concat(p, F.lit(";"), m))
        .when(mobile_ok & p.isNull(), m)
        .otherwise(p)
    )
    return s.select(
        F.lit("huyvesrcos").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("zip")).alias("postcode"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_string_udf(F.col("address")).alias("original"),
        combined.alias("phone"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# BENU pharmacies (dataproviders/hu_benu.py:51-90)
# ---------------------------------------------------------------------------

_BENU_REC_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("address_street", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)

# the reference's PATTERN_FULL_URL (address.py:41), matched with Python
# re semantics inside the UDF — the `\+-=` class range differs between
# regex dialects, so this stays Python-side
_BENU_URL_RX = r"((https?):((//)|(\\\\))+([\w\d:#@%/;$()~_?\+-=\\\.&](#!)?)*)"


@F.pandas_udf(T.StringType())
def _benu_website_udf(desc: pd.Series) -> pd.Series:
    import re as _re

    rx = _re.compile(_BENU_URL_RX)

    def one(v):
        if v is None:
            return None
        m = rx.match(v)
        return m.group(0).strip() if m is not None else None

    return pd.Series([one(v) for v in desc], dtype="object")


def benu_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """BENU feed (``dataproviders/hu_benu.py:51-90``): 'BENU Gyógyszertár'
    substring name-vs-branch split (NULL name drops at ``in None``);
    website = PATTERN_FULL_URL.match(description) — anchored at the
    string START, so a URL mid-text yields None (:70-74); postcode/city
    from the regex extract_all_address over the full address while
    street/housenumber/conscriptionnumber are OVERWRITTEN from
    better_2(address_street) (:75-79); original is the raw
    address_street."""
    s = (
        spark.read.schema(T.ArrayType(_BENU_REC_T).elementType)
        .option("multiLine", "true")
        .json(json_path)
        .where(F.col("name").isNotNull())
    )
    is_benu = F.col("name").contains("BENU Gyógyszertár")
    full = extract_all_address_udf(F.col("address"))
    ex = extract_street_udf(F.col("address_street"))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    return s.select(
        F.lit("hubenupha").alias("code"),
        F.when(~is_benu, clean_string_udf(F.col("name"))).alias("name"),
        F.when(is_benu, set_branch_udf(F.col("name"))).alias("branch"),
        _benu_website_udf(F.col("description")).alias("website"),
        clean_postcode_udf(full.postcode).alias("postcode"),
        clean_string_udf(full.city).alias("city"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address_street")).alias("original"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# Sameday easybox lockers (dataproviders/hu_easybox.py:53-79)
# ---------------------------------------------------------------------------

_EASYBOX_REC_T = T.StructType(
    [
        T.StructField("countryId", T.IntegerType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("city", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("lockerId", T.StringType()),
    ]
)


def easybox_lockers(spark: SparkSession, json_path: str) -> DataFrame:
    """Sameday easybox feed (``dataproviders/hu_easybox.py:53-79``):
    countryId == 237 selects Hungary; raw address through the
    clean_string original setter; better_2 street split; ref from
    lockerId (numeric ids stringify); pho False."""
    s = (
        spark.read.schema(T.StructType([T.StructField("data", T.ArrayType(_EASYBOX_REC_T))]))
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("data").alias("s"))
        .select("s.*")
        .where(F.col("countryId") == 237)
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    ex = extract_street_udf(F.col("address"))
    return s.select(
        F.lit("hueasybcso").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_city_udf(F.col("city")).alias("city"),
        set_branch_udf(F.col("name")).alias("branch"),
        clean_string_udf(F.col("address")).alias("original"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        F.lit(False).alias("public_holiday_open"),
        clean_string_udf(F.col("lockerId")).alias("ref"),
    )


# ---------------------------------------------------------------------------
# Sberbank branches + ATMs (dataproviders/hu_sber_bank.py:53-121)
# ---------------------------------------------------------------------------

_SBER_ADDR_T = T.StructType(
    [
        T.StructField("zipCode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("county", T.StringType()),
        T.StructField("coordinateX", T.DoubleType()),
        T.StructField("coordinateY", T.DoubleType()),
        T.StructField("street", T.StringType()),
        T.StructField("houseNumber", T.StringType()),
    ]
)

_SBER_DOC_T = T.StructType(
    [
        T.StructField(
            "atmList",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("atmNonstop", T.BooleanType()),
                        T.StructField("address", _SBER_ADDR_T),
                    ]
                )
            ),
        ),
        T.StructField(
            "branchList",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("address", _SBER_ADDR_T),
                        T.StructField("emailAppointment", T.StringType()),
                        T.StructField("phone", T.StringType()),
                        T.StructField(
                            "openTime",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("from", T.StringType()),
                                        T.StructField("to", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def sber_bank_pois(spark: SparkSession, json_path: str) -> DataFrame:
    """Sberbank feed (``dataproviders/hu_sber_bank.py:53-121``): ONE
    document feeds TWO record streams (atmList → husberatm with
    pho = atmNonstop-is-True; branchList → husberbank with pho False,
    email/phone and per-day openTime). Shared quirks:

    - Budapest districts: a city containing 'kerület' is replaced by the
      COUNTY field (:65-67, the raw city otherwise — clean_string setter);
    - street_tmp = ``'{} {}'.format(street, houseNumber.split('.')[0])``
      — NULL houseNumber raises → drop; NULL street renders the literal
      'None ...' (str.format quirk); ``original`` is that raw composite;
    - branch phone reads ``poi_data.get('phone'.split('/')[0])`` — the
      split runs on the KEY STRING and is a no-op (:96);
    - branch day entries: '' from/to → None; entries beyond index 6
      raise in day_open and are skipped by the inner continue (:97-114).
    """
    doc = (
        spark.read.schema(_SBER_DOC_T).option("multiLine", "true").json(json_path)
    )

    def common(rec):
        city_raw = rec("address.city")
        city = F.when(
            city_raw.contains("kerület"), rec("address.county")
        ).otherwise(city_raw)
        street_tmp = F.concat_ws(
            " ",
            F.coalesce(rec("address.street"), F.lit("None")),
            F.split(rec("address.houseNumber"), r"\.").getItem(0),
        )
        lat_fixed, lon_fixed = fix_hu_coordinates(
            rec("address.coordinateX"), rec("address.coordinateY")
        )
        ex = extract_street_udf(street_tmp)
        return [
            clean_postcode_udf(rec("address.zipCode")).alias("postcode"),
            clean_string_udf(city).alias("city"),
            lat_fixed.alias("lat"),
            lon_fixed.alias("lon"),
            ex.street.alias("street"),
            set_housenumber_udf(ex.housenumber).alias("housenumber"),
            ex.conscriptionnumber.alias("conscriptionnumber"),
            clean_string_udf(street_tmp).alias("original"),
        ]

    atms = (
        doc.select(F.explode("atmList").alias("a"))
        .where(F.col("a.address").isNotNull() & F.col("a.address.houseNumber").isNotNull())
        .select(
            F.lit("husberatm").alias("code"),
            F.coalesce(F.col("a.atmNonstop") == True, F.lit(False)).alias(  # noqa: E712
                "public_holiday_open"
            ),
            *common(lambda p: F.col(f"a.{p}")),
            F.lit(None).cast("string").alias("email"),
            F.lit(None).cast("string").alias("phone"),
            *[
                F.lit(None).cast("string").alias(f"{d}_{oc}")
                for d in ("mo", "tu", "we", "th", "fr", "sa", "su")
                for oc in ("open", "close")
            ],
        )
    )

    def day_slot(i, field):
        e = F.col("b.openTime")[i]
        v = e[field]
        ok = (F.lit(i) < F.size(F.coalesce(F.col("b.openTime"), F.array()))) & e.isNotNull()
        return F.when(ok, F.nullif(v, F.lit("")))

    branches = (
        doc.select(F.explode("branchList").alias("b"))
        .where(
            F.col("b.address").isNotNull()
            & F.col("b.address.houseNumber").isNotNull()
            # `for ... in openTime` raises on NULL → record dropped
            & F.col("b.openTime").isNotNull()
        )
        .select(
            F.lit("husberbank").alias("code"),
            F.lit(False).alias("public_holiday_open"),
            *common(lambda p: F.col(f"b.{p}")),
            clean_email_udf(F.col("b.emailAppointment")).alias("email"),
            clean_phone_udf(F.col("b.phone")).alias("phone"),
            *[
                day_slot(i, oc_field).alias(f"{d}_{oc}")
                for i, d in enumerate(("mo", "tu", "we", "th", "fr", "sa", "su"))
                for oc_field, oc in (("from", "open"), ("to", "close"))
            ],
        )
    )
    return atms.unionByName(branches)


# ---------------------------------------------------------------------------
# Nemzeti Dohánybolt (dataproviders/hu_nemzetidohanybolt.py:40-55)
# ---------------------------------------------------------------------------

_NEMZETI_REC_T = T.StructType(
    [
        T.StructField("postcode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
    ]
)


def nemzeti_dohanybolt_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Nemzeti Dohánybolt feed (``dataproviders/hu_nemzetidohanybolt.py:
    40-55``): the only provider with NO per-record try at all — the first
    record that raises (missing 'city'/'lat'/'lng'/'address' KEY)
    truncates the feed, prior records surviving (same min-position
    window as kulcs_patika). NULL VALUES under present keys flow
    through the cleaners without raising."""
    doc = spark.read.text(json_path, wholetext=True)
    recs = doc.select(
        F.posexplode(F.from_json("value", T.ArrayType(T.MapType(T.StringType(), T.StringType())))).alias(
            "pos", "m"
        )
    )
    # hu_nemzetidohanybolt.py subscripts poi_data['city'] (:48),
    # ['lat'] and ['lng'] (:51), ['address'] (:53) with no try — a
    # record missing ANY of those keys truncates the feed.
    raises = (
        ~F.map_contains_key(F.col("m"), "city")
        | ~F.map_contains_key(F.col("m"), "lat")
        | ~F.map_contains_key(F.col("m"), "lng")
        | ~F.map_contains_key(F.col("m"), "address")
    )
    from pyspark.sql import Window

    # INTENTIONAL single-partition window: one provider feed, document
    # order IS the semantics (sequential KeyError truncation). Not a
    # corpus-scale pattern — see global_row_number / global_rank_by.
    cutoff = F.min(F.when(raises, F.col("pos"))).over(Window.partitionBy())
    recs = recs.withColumn("cutoff", cutoff).where(
        F.col("cutoff").isNull() | (F.col("pos") < F.col("cutoff"))
    )
    m = F.col("m")
    lat_fixed, lon_fixed = fix_hu_coordinates(
        m["lat"].cast("double"), m["lng"].cast("double")
    )
    ex = extract_street_udf(m["address"])
    return recs.select(
        F.lit("hunemdotob").alias("code"),
        clean_postcode_udf(m["postcode"]).alias("postcode"),
        clean_city_udf(m["city"]).alias("city"),
        clean_string_udf(m["address"]).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# CIB Bank branches / ATMs (dataproviders/hu_cib_bank.py:57-95)
# ---------------------------------------------------------------------------

_CIB_REC_T = T.StructType(
    [
        T.StructField("locationStatus", T.StringType()),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("streetNo", T.StringType()),
        T.StructField("streetName", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("fullAddress", T.StringType()),
    ]
)


def cib_bank_pois(
    spark: SparkSession, json_path: str, provider_name: str = "CIB Bank"
) -> DataFrame:
    """CIB feed (``dataproviders/hu_cib_bank.py:57-95``): only
    'IN_SERVICE' locations; the module runs as two instances — the
    'CIB Bank' name selects hucibbank/pho False, anything else
    hucibatm/pho True (:66-71); street via clean_street(streetName) with
    housenumber from streetNo (no extraction); NULL location raises at
    the subscript → record dropped (per-record try, unlike kh_bank)."""
    s = (
        spark.read.schema(
            T.StructType([T.StructField("availableLocations", T.ArrayType(_CIB_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("availableLocations").alias("s"))
        .select("s.*")
        .where(
            (F.col("locationStatus") == "IN_SERVICE")
            & F.col("location").isNotNull()
        )
    )
    if provider_name == "CIB Bank":
        code, pho = F.lit("hucibbank"), F.lit(False)
    else:
        code, pho = F.lit("hucibatm"), F.lit(True)
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("location.lat"), F.col("location.lon")
    )
    return s.select(
        code.alias("code"),
        pho.alias("public_holiday_open"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_postcode_udf(F.col("zip")).alias("postcode"),
        set_housenumber_udf(F.col("streetNo")).alias("housenumber"),
        clean_street_udf(F.col("streetName")).alias("street"),
        set_branch_udf(F.col("name")).alias("branch"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        clean_email_udf(F.col("email")).alias("email"),
        clean_string_udf(F.col("fullAddress")).alias("original"),
    )


# ---------------------------------------------------------------------------
# MagNet Bank branches / ATMs (dataproviders/hu_magnet_bank.py:55-85)
# ---------------------------------------------------------------------------

_MAGNET_REC_T = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


def magnet_bank_pois(spark: SparkSession, json_path: str) -> DataFrame:
    """MagNet feed (``dataproviders/hu_magnet_bank.py:55-85``): the
    ``if address is not None`` guard wraps every FIELD assignment but
    ``add()`` sits OUTSIDE it — NULL-address records are still emitted
    as all-NULL rows (:62-80). type '1' → ATM/pho True; '0'/'2' → bank/
    pho False + email + the HARDCODED '+36 1 428 8888' phone; unknown
    types keep code/pho NULL. Waxeye address split."""
    s = (
        spark.read.schema(
            T.StructType([T.StructField("result", T.ArrayType(_MAGNET_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("result").alias("s"))
        .select("s.*")
    )
    has_addr = F.col("address").isNotNull()
    t = F.col("type")
    code = F.when(
        has_addr,
        F.when(t == "1", F.lit("humagnatm")).when(
            t.isin("0", "2"), F.lit("humagnbank")
        ),
    )
    pho = F.when(
        has_addr,
        F.when(t == "1", F.lit(True)).when(t.isin("0", "2"), F.lit(False)),
    )
    is_bank = has_addr & t.isin("0", "2")
    ex = parse_address_udf(F.col("address"))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lon"))
    return s.select(
        code.alias("code"),
        pho.alias("public_holiday_open"),
        F.when(is_bank, clean_email_udf(F.col("email"))).alias("email"),
        F.when(is_bank, F.lit("+36 1 428 8888")).alias("phone"),
        F.when(has_addr, clean_postcode_udf(ex.postcode)).alias("postcode"),
        F.when(has_addr, clean_string_udf(ex.city)).alias("city"),
        F.when(has_addr, ex.street).alias("street"),
        F.when(has_addr, set_housenumber_udf(ex.housenumber)).alias("housenumber"),
        F.when(has_addr, ex.conscriptionnumber).alias("conscriptionnumber"),
        F.when(has_addr, lat_fixed).alias("lat"),
        F.when(has_addr, lon_fixed).alias("lon"),
        F.when(has_addr, clean_string_udf(F.col("address"))).alias("original"),
    )


# ---------------------------------------------------------------------------
# AVIA fuel stations (dataproviders/hu_avia.py:50-100)
# ---------------------------------------------------------------------------

_AVIA_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("title", T.StringType()),
            T.StructField("kutid", T.StringType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
            T.StructField("cim", T.StringType()),
            T.StructField("tel", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("b95", T.StringType()),
            T.StructField("b95g", T.StringType()),
            T.StructField("dies", T.StringType()),
            T.StructField("gdies", T.StringType()),
            T.StructField("b98", T.StringType()),
            T.StructField("lpg", T.StringType()),
            T.StructField("e85", T.StringType()),
            T.StructField("pgaz", T.StringType()),
            T.StructField("komp", T.StringType()),
            T.StructField("etterem", T.StringType()),
            T.StructField("bufe", T.StringType()),
            T.StructField("kpark", T.StringType()),
        ]
    )
)


def avia_stations(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """AVIA feed (``dataproviders/hu_avia.py:50-100``): the markers JS
    variable extracted with use_replace=True (every apostrophe in the
    script becomes a double quote before parsing, address.py:249); city
    starts as the raw ``title`` (the ``if self.data.city is None`` guard
    is always true after clear_all) and is then OVERWRITTEN by the
    waxeye split when ``cim`` is non-empty (:61-70); website is a
    formatted /toltoallomas/?id= path when kutid clean_strings non-None;
    '1'-string service flags → explicit True/False family."""
    from ..extract.html import js_var_replace_udf

    payload = js_var_replace_udf(F.col(html_col), F.lit("markers"))
    s = (
        pages.select(F.from_json(payload, _AVIA_REC_T).alias("markers"))
        .where(F.col("markers").isNotNull())
        .select(F.explode("markers").alias("s"))
        .select("s.*")
    )
    kutid_c = clean_string_udf(F.col("kutid"))
    cim_ok = F.col("cim").isNotNull() & (F.col("cim") != "")
    ex = parse_address_udf(F.col("cim"))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    flag = lambda c: c == "1"
    return s.select(
        F.lit("huaviafu").alias("code"),
        F.when(cim_ok, clean_string_udf(ex.city))
        .otherwise(clean_string_udf(F.col("title")))
        .alias("city"),
        F.when(
            F.col("kutid").isNotNull() & (F.col("kutid") != ""),
            clean_string_udf(F.col("kutid")),
        ).alias("ref"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        F.when(cim_ok, clean_postcode_udf(ex.postcode)).alias("postcode"),
        F.when(cim_ok, ex.street).alias("street"),
        F.when(cim_ok, set_housenumber_udf(ex.housenumber)).alias("housenumber"),
        F.when(cim_ok, ex.conscriptionnumber).alias("conscriptionnumber"),
        F.when(
            kutid_c.isNotNull(),
            F.concat(F.lit("/toltoallomas/?id="), kutid_c),
        ).alias("website"),
        clean_string_udf(F.col("cim")).alias("original"),
        clean_phone_udf(F.col("tel")).alias("phone"),
        clean_email_udf(F.col("email")).alias("email"),
        F.lit(False).alias("public_holiday_open"),
        (flag(F.col("b95")) | flag(F.col("b95g"))).alias("fuel_octane_95"),
        (flag(F.col("dies")) | flag(F.col("gdies"))).alias("fuel_diesel"),
        flag(F.col("b98")).alias("fuel_octane_98"),
        flag(F.col("lpg")).alias("fuel_lpg"),
        flag(F.col("e85")).alias("fuel_e85"),
        flag(F.col("pgaz")).alias("rent_lpg_bottles"),
        flag(F.col("komp")).alias("compressed_air"),
        flag(F.col("etterem")).alias("restaurant"),
        flag(F.col("bufe")).alias("food"),
        flag(F.col("kpark")).alias("truck"),
    )


# ---------------------------------------------------------------------------
# Mobil Petrol (dataproviders/hu_mobil_petrol.py:49-98)
# ---------------------------------------------------------------------------

_MOBPE_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("description", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("address", T.StringType()),
            T.StructField("lat", T.DoubleType()),
            T.StructField("lng", T.DoubleType()),
            T.StructField("phone", T.StringType()),
            T.StructField("services", T.StringType()),
        ]
    )
)


@F.pandas_udf(_MOBPE_REC_T)
def _mobpe_extract_udf(payload: pd.Series) -> pd.Series:
    """totem_stations is a JSON OBJECT iterated via .values()
    (hu_mobil_petrol.py:57) — document key order matters for the
    locals() leak below, so extraction stays Python-side."""
    import json as _json

    def one(txt):
        if txt is None:
            return None
        try:
            recs = []
            for i, v in enumerate(_json.loads(txt).values()):
                loc = v.get("location") or {}
                recs.append(
                    (
                        i,
                        v.get("description"),
                        v.get("city"),
                        v.get("address"),
                        loc.get("lat"),
                        loc.get("lng"),
                        v.get("phone"),
                        v.get("services"),
                    )
                )
            return recs
        except Exception:
            return None

    return pd.Series([one(t) for t in payload], dtype="object")


# the elif chain order at hu_mobil_petrol.py:74-87
_MOBPE_RANGES = [("6-22", "06:00", "22:00"), ("6-21", "06:00", "21:00"),
                 ("5-22", "05:00", "22:00"), ("6-18", "06:00", "18:00")]


def mobil_petrol_stations(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Mobil Petrol feed (``dataproviders/hu_mobil_petrol.py:49-98``).
    The day range comes from a services-substring elif chain whose
    ``if 'open_from' in locals()`` guard reads FUNCTION-level locals —
    open_from/open_to persist across loop iterations, so a non-nonstop
    record with NO matching range inherits the LAST matched range from
    any earlier record in the feed (:70-89). That is a carry-forward
    window over the document order. '0-24' → nonstop+pho True with no
    day assignment; NULL services raises at ``in`` → record dropped;
    NULL location drops at the subscript. postcode is explicitly None."""
    from ..extract.html import js_var_udf

    payload = js_var_udf(F.col(html_col), F.lit("totem_stations"))
    recs = (
        pages.select(_mobpe_extract_udf(payload).alias("recs"))
        .where(F.col("recs").isNotNull())
        .select(F.explode("recs").alias("s"))
        .select("s.*")
        .where(F.col("services").isNotNull() & F.col("lat").isNotNull())
    )
    sv = F.col("services")
    is_nonstop = sv.contains("0-24")
    # the elif chain: FIRST matching probe wins (chain order)
    matched_o, matched_c = None, None
    for probe, o, c in _MOBPE_RANGES:
        cond = sv.contains(probe)
        matched_o = F.when(cond, F.lit(o)) if matched_o is None else matched_o.when(cond, F.lit(o))
        matched_c = F.when(cond, F.lit(c)) if matched_c is None else matched_c.when(cond, F.lit(c))

    from pyspark.sql import Window

    # INTENTIONAL single-partition window: one provider feed, the
    # carry-forward (elif-chain memory) follows document order. Not a
    # corpus-scale pattern — see global_row_number / global_rank_by.
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    carry_o = F.last(
        F.when(~is_nonstop, matched_o), ignorenulls=True
    ).over(w)
    carry_c = F.last(
        F.when(~is_nonstop, matched_c), ignorenulls=True
    ).over(w)
    staged = recs.select(
        "*",
        is_nonstop.alias("_nonstop"),
        carry_o.alias("_oh_o"),
        carry_c.alias("_oh_c"),
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    ex = extract_street_udf(F.col("address"))
    day_o = F.when(~F.col("_nonstop"), F.col("_oh_o"))
    day_c = F.when(~F.col("_nonstop"), F.col("_oh_c"))
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    return staged.select(
        F.lit("humobpefu").alias("code"),
        clean_url_udf(F.col("description")).alias("website"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_string_udf(F.col("address")).alias("original"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        F.lit(None).cast("string").alias("postcode"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        F.when(F.col("_nonstop"), F.lit(True)).alias("nonstop"),
        F.when(F.col("_nonstop"), F.lit(True)).otherwise(F.lit(False)).alias(
            "public_holiday_open"
        ),
        *[
            col.alias(f"{d}_{suffix}")
            for d in day_names
            for col, suffix in ((day_o, "open"), (day_c, "close"))
        ],
    )


# ---------------------------------------------------------------------------
# CCC shoes (dataproviders/hu_ccc.py:62-87)
# ---------------------------------------------------------------------------

_CCC_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
            T.StructField("postcode", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("street", T.StringType()),
            T.StructField("house_number", T.StringType()),
            T.StructField("openings", T.StringType()),
        ]
    )
)


def ccc_stores(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """CCC feed (``dataproviders/hu_ccc.py:62-87``): the store list is the
    TEXT CONTENT of ``<div id="pos-list-json">``; better_2's housenumber
    is immediately OVERWRITTEN by house_number with dots stripped (a NULL
    house_number raises at .replace → drop, :74-76); ``openings`` is
    fetched and never used (dead, :77)."""
    from ..extract.html import div_text_udf

    payload = div_text_udf(F.col(html_col), F.lit("pos-list-json"))
    s = (
        pages.select(F.from_json(payload, _CCC_REC_T).alias("pois"))
        .where(F.col("pois").isNotNull())
        .select(F.explode("pois").alias("s"))
        .select("s.*")
        .where(F.col("house_number").isNotNull())
    )
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.col("latitude"), F.col("longitude")
    )
    ex = extract_street_udf(F.col("street"))
    return s.select(
        F.lit("hucccsho").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("postcode")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(
            F.regexp_replace(F.col("house_number"), r"\.", "")
        ).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("street")).alias("original"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# JYSK (dataproviders/hu_jysk.py:48-80)
# ---------------------------------------------------------------------------

_JYSK_INDEX_T = T.StructType(
    [
        T.StructField(
            "storesCoordinates",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType()),
                        T.StructField("lng", T.DoubleType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("id", T.StringType()),
                    ]
                )
            ),
        )
    ]
)

_JYSK_DETAIL_T = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("tel", T.StringType()),
        T.StructField("house", T.StringType()),
        T.StructField("shop_name", T.StringType()),
    ]
)


def jysk_stores(
    index_pages: DataFrame, detail_pages: DataFrame, html_col: str = "html"
) -> DataFrame:
    """JYSK feed (``dataproviders/hu_jysk.py:48-80``): the index page's
    StoresLocatorLayout div carries the store list in its
    data-jysk-react-properties ATTRIBUTE; each store then needs a SECOND
    page fetch (?storeId=) whose SecondaryNavigation div carries the
    detail JSON — the reference's per-record HTTP round trip becomes a
    broadcast join of a ``detail_pages(ref, html)`` table. A missing or
    unparsable detail page raises in the reference → record dropped
    (inner join). The raw-name branch assignment at :59 is OVERWRITTEN
    by clean_branch(shop_name) at :72; street via clean_street,
    housenumber via clean_string — no extraction."""
    from ..extract.html import div_attr_udf

    idx_payload = div_attr_udf(
        F.col(html_col),
        F.lit("data-jysk-react-component"),
        F.lit("StoresLocatorLayout"),
        F.lit("data-jysk-react-properties"),
    )
    stores = (
        index_pages.select(
            F.from_json(idx_payload, _JYSK_INDEX_T).alias("j")
        )
        .where(F.col("j").isNotNull())
        .select(F.explode("j.storesCoordinates").alias("s"))
        .select("s.*")
        .withColumn("ref", clean_string_udf(F.col("id")))
    )
    det_payload = div_attr_udf(
        detail_pages[html_col],
        F.lit("data-jysk-react-component"),
        F.lit("SecondaryNavigation"),
        F.lit("data-jysk-react-properties"),
    )
    details = detail_pages.select(
        F.col("ref"), F.from_json(det_payload, _JYSK_DETAIL_T).alias("d")
    ).where(F.col("d").isNotNull())
    joined = stores.join(F.broadcast(details), "ref", "inner")
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    return joined.select(
        F.lit("hujyskfur").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        F.col("ref"),
        clean_city_udf(F.col("d.city")).alias("city"),
        clean_postcode_udf(F.col("d.zip")).alias("postcode"),
        clean_street_udf(F.col("d.street")).alias("street"),
        clean_phone_udf(F.col("d.tel")).alias("phone"),
        set_housenumber_udf(F.col("d.house")).alias("housenumber"),
        set_branch_udf(F.col("d.shop_name")).alias("branch"),
    )


# ---------------------------------------------------------------------------
# Tom Market (dataproviders/hu_tom_market.py:45-82)
# ---------------------------------------------------------------------------

# hu_tom_market.py:22
_TOM_COMPANY_TYPES = [" e.v.", " ev.", " kft.", " KFT", " bt.", " bt"]

_TOM_REC_T = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("address", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)


def tom_market_stores(spark: SparkSession, json_path: str) -> DataFrame:
    """Tom Market feed (``dataproviders/hu_tom_market.py:45-82``): records
    whose name contains a company-suffix fragment (' e.v.', ' kft.', …)
    are SKIPPED entirely (:59-62); non-empty non-company names become the
    raw branch; the feed is JSON despite the HTML file type (:52)."""
    s = (
        spark.read.schema(
            T.StructType([T.StructField("partners", T.ArrayType(_TOM_REC_T))])
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode("partners").alias("s"))
        .select("s.*")
    )
    name_ok = F.col("name").isNotNull() & (F.col("name") != "")
    is_company = name_ok & reduce(
        lambda a, b: a | b,
        [F.col("name").contains(t) for t in _TOM_COMPANY_TYPES],
    )
    s = s.where(~F.coalesce(is_company, F.lit(False)))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    ex = extract_street_udf(F.col("address"))
    return s.select(
        F.lit("hutommacon").alias("code"),
        F.when(name_ok, set_branch_udf(F.col("name"))).alias("branch"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_city_udf(F.col("city")).alias("city"),
        clean_postcode_udf(F.col("postcode")).alias("postcode"),
        clean_string_udf(F.col("address")).alias("original"),
        clean_phone_udf(F.col("phone")).alias("phone"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# Rossmann (dataproviders/hu_rossmann.py:53-95)
# ---------------------------------------------------------------------------

_ROSS_REC_T = T.StructType(
    [
        T.StructField(
            "props",
            T.StructType(
                [
                    T.StructField(
                        "pageProps",
                        T.StructType(
                            [
                                T.StructField(
                                    "stores",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField("lat", T.DoubleType()),
                                                T.StructField("lng", T.DoubleType()),
                                                T.StructField("zip_code", T.StringType()),
                                                T.StructField("city", T.StringType()),
                                                T.StructField("street", T.StringType()),
                                                T.StructField("openings", T.StringType()),
                                                T.StructField("address", T.StringType()),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)


def rossmann_stores(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Rossmann feed (``dataproviders/hu_rossmann.py:53-95``): the Next.js
    ``<script type="application/json">`` payload →
    props.pageProps.stores; ``openings`` is a newline-joined 7-line
    string — each line through clean_opening_hours, a day set only when
    BOTH halves parse (:77-85); fewer than 7 lines raises IndexError →
    record dropped; NULL openings skips the day block (days NULL)."""
    from ..extract.html import script_attr_text_udf

    payload = script_attr_text_udf(
        F.col(html_col), F.lit("type"), F.lit("application/json")
    )
    s = (
        pages.select(F.from_json(payload, _ROSS_REC_T).alias("j"))
        .where(F.col("j.props.pageProps.stores").isNotNull())
        .select(F.explode("j.props.pageProps.stores").alias("s"))
        .select("s.*")
    )
    lines = F.split(F.col("openings"), "\n")
    s = s.where(F.col("openings").isNull() | (F.size(lines) >= 7))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    ex = extract_street_udf(F.col("street"))
    day_names = ["mo", "tu", "we", "th", "fr", "sa", "su"]
    day_cols = []
    for i, d in enumerate(day_names):
        o, c = _clean_opening_hours_expr(lines[i])
        both = o.isNotNull() & c.isNotNull()
        gate = F.col("openings").isNotNull() & both
        day_cols.append(F.when(gate, o).alias(f"{d}_open"))
        day_cols.append(F.when(gate, c).alias(f"{d}_close"))
    return s.select(
        F.lit("hurossmche").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_postcode_udf(F.col("zip_code")).alias("postcode"),
        clean_city_udf(F.col("city")).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(F.col("address")).alias("original"),
        F.lit(False).alias("public_holiday_open"),
        *day_cols,
    )


# ---------------------------------------------------------------------------
# Pingvin patika (dataproviders/hu_pingvin_patika.py:58-88)
# ---------------------------------------------------------------------------

_PINGVIN_REC_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
            T.StructField("address", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
)


def pingvin_patika_stores(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Pingvin patika feed (``dataproviders/hu_pingvin_patika.py:58-88``):
    the pharmacies JS variable (the quote-escaping replaces at :66-68 are
    Python no-ops — '\\\"' IS '\"' — so none are modeled);
    extract_city_street_housenumber_address 4-way split; description is
    the text of the LAST <p> of the per-record content HTML — missing
    content parses the literal 'lxml' default (the misplaced parser arg,
    :78) which has no <p>, leaving description unset."""
    from ..extract.html import js_var_udf, last_p_text_udf

    payload = js_var_udf(F.col(html_col), F.lit("pharmacies"))
    s = (
        pages.select(F.from_json(payload, _PINGVIN_REC_T).alias("pois"))
        .where(F.col("pois").isNotNull())
        .select(F.explode("pois").alias("s"))
        .select("s.*")
    )
    ex = extract_city_address_udf(F.col("address"))
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lon"))
    return s.select(
        F.lit("hupingvpha").alias("code"),
        lat_fixed.alias("lat"),
        lon_fixed.alias("lon"),
        clean_string_udf(ex.city).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(last_p_text_udf(F.col("content"))).alias("description"),
        F.lit(False).alias("public_holiday_open"),
    )


# ---------------------------------------------------------------------------
# MOL Bubi bike share (dataproviders/hu_mol_bubi.py:51-104)
# ---------------------------------------------------------------------------

_BUBI_REC_T = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
    ]
)


def mol_bubi_docks(spark: SparkSession, json_path: str) -> DataFrame:
    """MOL Bubi feed (``dataproviders/hu_mol_bubi.py:51-104``): places
    under countries[0].cities[0]; the dash-split name → ref = part 0,
    branch = part 1 (when >1 parts), description = part 2 (the guard
    evaluates split[2] FIRST, so 2-part names IndexError into the inner
    except and skip description, :74-92); city is the constant
    'Budapest'; nonstop and pho True; postcode explicitly None."""
    s = (
        spark.read.schema(
            T.StructType(
                [
                    T.StructField(
                        "countries",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "cities",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "places",
                                                        T.ArrayType(_BUBI_REC_T),
                                                    )
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            )
        )
        .option("multiLine", "true")
        .json(json_path)
        .select(F.explode(F.col("countries")[0]["cities"][0]["places"]).alias("s"))
        .select("s.*")
    )
    name_ok = F.col("name").isNotNull() & (F.col("name") != "")
    cleaned = clean_string_udf(F.col("name"))
    parts_raw = F.split(F.col("name"), "-")
    nparts = F.size(F.split(cleaned, "-"))
    return s.select(
        F.lit("hububibir").alias("code"),
        F.lit("Budapest").alias("city"),
        # hu_mol_bubi.py:77 assigns clean_string(part) through the
        # branch SETTER, which adds clean_branch (poi_dataset.py:220)
        F.when(
            name_ok & cleaned.isNotNull() & (nparts > 1),
            set_branch_udf(F.get(parts_raw, 1)),
        ).alias("branch"),
        F.when(
            name_ok & (F.size(parts_raw) > 2) & (nparts > 2),
            clean_string_udf(F.get(parts_raw, 2)),
        ).alias("description"),
        F.when(name_ok & cleaned.isNotNull(), clean_string_udf(F.get(parts_raw, 0))).alias(
            "ref"
        ),
        F.lit(True).alias("nonstop"),
        F.lit(True).alias("public_holiday_open"),
        *fix_and_alias_lat_lon(),
        F.lit(None).cast("string").alias("postcode"),
    )


def fix_and_alias_lat_lon():
    lat_fixed, lon_fixed = fix_hu_coordinates(F.col("lat"), F.col("lng"))
    return [lat_fixed.alias("lat"), lon_fixed.alias("lon")]


# ---------------------------------------------------------------------------
# MOL Plugee EV chargers (dataproviders/hu_mol_plugee_ev.py:50-92)
# ---------------------------------------------------------------------------


def mol_plugee_chargers(spark: SparkSession, csv_path: str) -> DataFrame:
    """MOL Plugee CSV (``dataproviders/hu_mol_plugee_ev.py:50-92``):
    ``sep=';'`` with ``skiprows=1`` (the real header is the second
    line); comma-decimal coordinates guarded by an isinstance-float
    check — a missing cell is a pandas float NaN, so the row KEEPS NULL
    coordinates instead of raising (:65-67); socket counts go through
    the guarded int setters ('nan' sentinel → unset) and outputs through
    clean_string; capacity int-guarded; model/manufacturer clean_string."""
    # skiprows=1: drop the first physical line before the header
    # parse, WITHOUT collecting to the driver — zipWithIndex preserves
    # file order (partition-major), so index 0 is the first line; the
    # surviving lines feed spark.read.csv as a distributed RDD[str].
    body_rdd = (
        spark.read.text(csv_path)
        .rdd.zipWithIndex()
        .filter(lambda t: t[1] > 0)
        .map(lambda t: t[0]["value"])
    )
    s = (
        spark.read.option("header", "true")
        .option("sep", ";")
        .csv(body_rdd)
    )

    def col(name):
        return s[name]

    lat_s, lng_s = col("X"), col("Y")
    coords_ok = lat_s.isNotNull() & lng_s.isNotNull()
    lat_fixed, lon_fixed = fix_hu_coordinates(
        F.regexp_replace(lat_s, ",", ".").cast("double"),
        F.regexp_replace(lng_s, ",", ".").cast("double"),
    )
    ex = extract_street_udf(col("Cím"))
    int_guard = lambda c: F.floor(
        F.when(clean_string_udf(c).isNotNull(), clean_string_udf(c).cast("double"))
    ).cast("int")
    return s.select(
        F.lit("humolplchs").alias("code"),
        clean_string_udf(col("Azonosító")).alias("ref"),
        clean_postcode_udf(col("Irányító szám")).alias("postcode"),
        clean_city_udf(col("Település")).alias("city"),
        ex.street.alias("street"),
        set_housenumber_udf(ex.housenumber).alias("housenumber"),
        ex.conscriptionnumber.alias("conscriptionnumber"),
        clean_string_udf(col("Cím")).alias("original"),
        F.when(coords_ok, lat_fixed).alias("lat"),
        F.when(coords_ok, lon_fixed).alias("lon"),
        int_guard(col("Darab (CHAdeMO)")).alias("socket_chademo"),
        clean_string_udf(col("Teljesítmény (CHAdeMO)")).alias("socket_chademo_output"),
        int_guard(col("Darab (CCS)")).alias("socket_type2_combo"),
        clean_string_udf(col("Teljesítmény (CCS)")).alias("socket_type2_combo_output"),
        int_guard(col("Darab (Type 2)")).alias("socket_type2_cable"),
        clean_string_udf(col("Teljesítmény (Type 2)")).alias("socket_type2_cable_output"),
        int_guard(col("Darab (Type 2 – kábel nélkül)")).alias("socket_type2_cableless"),
        clean_string_udf(col("Teljesítmény (Type 2 – kábel nélkül)")).alias(
            "socket_type2_cableless_output"
        ),
        clean_string_udf(col("Gyártó")).alias("manufacturer"),
        clean_string_udf(col("Típus")).alias("model"),
        int_guard(col("Kapacitás")).alias("capacity"),
    )


# ---------------------------------------------------------------------------
# Volánbusz stops (dataproviders/hu_volanbusz.py:52-98 — byte-identical to
# hu_mav except the constant code)
# ---------------------------------------------------------------------------


def volanbusz_stops(spark: SparkSession, gtfs_zip_path: str) -> DataFrame:
    """hu_volanbusz ≡ hu_mav with code 'huvolantra'."""
    return mav_stations(spark, gtfs_zip_path).withColumn(
        "code", F.lit("huvolantra")
    )

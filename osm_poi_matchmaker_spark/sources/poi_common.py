# -*- coding: utf-8 -*-
"""The real ``poi_common`` brand dimension harvested from ``types()``.

Every reference dataprovider ships static brand metadata from its
``types()`` method (e.g. ``dataproviders/hu_tesco.py:62-81``): poi_code,
poi_type, OSM tag payload merged from the payment tag sets in
``libs/osm_tag_sets.py:1-17``, search/avoid regexes and the per-brand
search distances. ``insert_type`` → ``get_or_create_common``
(``dao/data_handlers.py:857,401``) lands them in the ``poi_common``
table (``dao/data_structure.py:318-340``) with FIRST-INSERT-WINS
semantics on the unique poi_code, in the module-enable order of
``app.conf-template:38`` (hu_posta before hu_posta_json, which decides
the five duplicated ``huposta*`` codes).

The harvested rows live in ``resources/poi_common.jsonl`` (regenerate
with ``tools/harvest_poi_common.py``); this module loads them as a
75-row dimension — always broadcast — and exposes the first-insert-wins
view plus the tag payload as a MapType column for F20 tag merging and
the K2 OSM-XML export.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESOURCE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "poi_common.jsonl",
)

POI_COMMON_SCHEMA = T.StructType(
    [
        T.StructField("provider", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("poi_code", T.StringType()),
        T.StructField("poi_common_name", T.StringType()),
        T.StructField("poi_type", T.StringType()),
        # canonical JSON string (sorted keys) — parse with tags_map()
        T.StructField("poi_tags", T.StringType()),
        T.StructField("poi_url_base", T.StringType()),
        T.StructField("poi_search_name", T.StringType()),
        T.StructField("poi_search_avoid_name", T.StringType()),
        T.StructField("preserve_original_name", T.BooleanType()),
        T.StructField("preserve_original_post_code", T.BooleanType()),
        T.StructField("export_poi_name", T.BooleanType()),
        T.StructField("do_not_export_addr_tags", T.BooleanType()),
        T.StructField("osm_search_distance_perfect", T.IntegerType()),
        T.StructField("osm_search_distance_safe", T.IntegerType()),
        T.StructField("osm_search_distance_unsafe", T.IntegerType()),
        T.StructField("additional_ref_name", T.StringType()),
    ]
)

# Bridge from the synthetic workload's 12-brand dim (synth.py BRANDS) to
# the harvested poi_common codes, used to attach real tag payloads to
# cascade winners. Lidl and OTP have no reference dataprovider, so those
# two synthetic brands carry no common-tag payload (left-join null).
BRAND_CODE_TO_COMMON = {
    "hutescoexp": "hutescoexp",
    "hutescoext": "hutescoext",
    "huspar": "husparsup",
    "hualdi": "hualdisup",
    "hucba": "hucbasup",
    "humolpet": "humolfu",
    "huomv": "huomvfu",
    "huposta": "hupostapo",
    "humav": "humavstart",
    "hukh": "hukhbank",
}


def poi_common_raw(spark: SparkSession, path: str | None = None) -> DataFrame:
    """All harvested ``types()`` rows, one per (provider, poi_code)."""
    return spark.read.schema(POI_COMMON_SCHEMA).json(path or RESOURCE_PATH)


def poi_common_dim(spark: SparkSession, path: str | None = None) -> DataFrame:
    """The ``poi_common`` table view: unique poi_code, first-insert-wins.

    ``get_or_create_common`` (dao/data_handlers.py:401-440) keeps the
    row from whichever enabled module ran first, so duplicates resolve
    by min ``seq`` (the module-enable order captured at harvest time).
    70 rows — always broadcast by every consumer.
    """
    w = Window.partitionBy("poi_code").orderBy("seq")
    return (
        poi_common_raw(spark, path)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def tags_map(col="poi_tags") -> F.Column:
    """The canonical-JSON tag payload as map<string,string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, T.MapType(T.StringType(), T.StringType()))


def brand_code_bridge(spark: SparkSession) -> DataFrame:
    """LocalRelation mapping synthetic brand codes → harvested poi_codes.

    A VALUES literal (JVM LocalRelation), matching synth.poi_common_df's
    convention: no Python workers in any plan that broadcasts it.
    """
    rows = ", ".join(
        f"('{k}', '{v}')" for k, v in sorted(BRAND_CODE_TO_COMMON.items())
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {rows}) AS t(poi_code, common_code)"
    )

"""Export sinks — CSV / GeoJSON / OSM-XML renderings of match output.

Reference: ``libs/file_output.py`` (CSV :113-129, GeoJSON :237-314,
OSM-XML :317-784) and the grouped fan-out ``libs/export.py:57-166``.
The reference renders row-at-a-time with lxml; the engine renders each
format as a column expression (GeoJSON/CSV) or a deterministic per-row
string template (OSM-XML) and writes with ``partitionBy`` — the grouped
per-brand fan-out becomes a partitioned write instead of a process pool.

Parity quirks preserved:
- new POIs get NEGATIVE, DECREASING synthetic ids in OSM-XML
  (file_output.py:337,764) — implemented as ``-row_number`` over a pinned
  deterministic order;
- export ordering pinned by (poi_code, postcode, …) sort (W4,
  dao/poi_base.py:104-107) so byte-level diffs are stable run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def geojson_feature(df: DataFrame, props: list[str], lat: str = "lat", lon: str = "lon"):
    """Column: one GeoJSON Feature per row (properties from ``props``)."""
    prop_struct = F.struct(*[F.col(c).alias(c) for c in props])
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(lon), F.col(lat)).alias("coordinates"),
            ).alias("geometry"),
            prop_struct.alias("properties"),
        )
    )


def to_geojson_collection(df: DataFrame, props: list[str]) -> str:
    """Whole-frame FeatureCollection string (driver-side assembly — only
    for parity-sized exports; at scale use write_geojson_partitioned)."""
    feats = [r["f"] for r in df.select(geojson_feature(df, props).alias("f")).collect()]
    return '{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}"


def osm_xml_nodes(df: DataFrame, tag_cols: list[str], lat: str = "lat", lon: str = "lon"):
    """DataFrame of rendered ``<node>`` XML fragments with reference id
    semantics: matched rows keep osm_id, new rows get -1, -2, … in pinned
    (page_id) order."""
    w = Window.partitionBy(F.col("poi_new")).orderBy("page_id")
    xml_id = F.when(~F.col("poi_new"), F.col("osm_id")).otherwise(
        -F.row_number().over(w).cast("long")
    )
    tags = F.concat(
        *[
            F.when(
                F.col(c).isNotNull(),
                F.concat(
                    F.lit(f'  <tag k="{c}" v="'),
                    F.col(c).cast("string"),
                    F.lit('"/>\n'),
                ),
            ).otherwise(F.lit(""))
            for c in tag_cols
        ]
    )
    frag = F.concat(
        F.lit('<node id="'),
        xml_id.cast("string"),
        F.lit('" lat="'),
        F.col(lat).cast("string"),
        F.lit('" lon="'),
        F.col(lon).cast("string"),
        F.lit('">\n'),
        tags,
        F.lit("</node>"),
    )
    return df.select("page_id", F.col("poi_new"), frag.alias("xml"))


def write_grouped_exports(
    matched: DataFrame, out_dir: str, group_col: str = "name"
) -> None:
    """K5/K6: one export tree per brand group + new/existing split,
    expressed as partitioned writes (no process pool, no driver loop)."""
    (
        matched.withColumn(
            "export_group",
            F.when(F.col("poi_new"), F.lit("poi_new")).otherwise(F.lit("poi_existing")),
        )
        .repartition(group_col)
        .write.mode("overwrite")
        .partitionBy(group_col, "export_group")
        .parquet(out_dir)
    )

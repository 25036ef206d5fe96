"""Export sink tests: GeoJSON shape, OSM-XML negative-id semantics,
grouped partitioned write layout."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.plans.export import (
    geojson_feature,
    osm_xml_nodes,
    to_geojson_collection,
    write_grouped_exports,
)

SF = "/root/testdata/sf0.001"


def _matched(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    return m._match(spark, SF)


def test_geojson_feature_shape(spark):
    df = spark.createDataFrame(
        [(1, 47.5, 19.0, "Tesco")], ["page_id", "lat", "lon", "name"]
    )
    feat = json.loads(
        df.select(geojson_feature(df, ["page_id", "name"]).alias("f")).collect()[0]["f"]
    )
    assert feat["type"] == "Feature"
    assert feat["geometry"]["coordinates"] == [19.0, 47.5]  # lon first (GeoJSON)
    assert feat["properties"]["name"] == "Tesco"


def test_geojson_collection_parses(spark):
    df = _matched(spark).limit(5).select("page_id", "lat", "lon", "name")
    col = json.loads(to_geojson_collection(df, ["page_id", "name"]))
    assert col["type"] == "FeatureCollection"
    assert len(col["features"]) == 5


def test_osm_xml_new_ids_negative_decreasing(spark):
    frags = osm_xml_nodes(
        _matched(spark), tag_cols=["name"], lat="lat", lon="lon"
    ).collect()
    new_ids = []
    for r in frags:
        first_line = r["xml"].split("\n", 1)[0]
        xml_id = int(first_line.split('id="')[1].split('"')[0])
        if r["poi_new"]:
            new_ids.append(xml_id)
            assert xml_id < 0
    # negative ids are distinct and dense -1..-N (order pinned by page_id)
    assert sorted(new_ids) == list(range(-len(new_ids), 0))


def test_grouped_export_layout(spark, tmp_path):
    out = str(tmp_path / "exports")
    write_grouped_exports(_matched(spark), out, group_col="name")
    groups = [d for d in os.listdir(out) if d.startswith("name=")]
    assert len(groups) >= 5  # one dir per brand present
    inner = os.listdir(os.path.join(out, groups[0]))
    assert any(d.startswith("export_group=") for d in inner)


def test_global_row_number_matches_single_window(spark):
    """Two-phase distributed numbering == the single-partition window
    form, including ties-free total order and multi-bucket spans."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from osm_poi_matchmaker_spark.plans.export import global_row_number

    df = spark.range(0, 20000).select(
        (F.col("id") * 7919 % 100003).alias("k"),  # scrambled order key
        (F.col("id") % 3 == 0).alias("part"),
    ).distinct()
    w = Window.partitionBy("part").orderBy("k")
    want = {
        (r["part"], r["k"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = {
        (r["part"], r["k"]): r["_rn"]
        for r in global_row_number(df, ["part"], "k", bucket_shift=8).collect()
    }
    assert got == want


def test_osm_xml_numbering_plan_is_bucketed(spark):
    """The negative-id numbering must window over (poi_new, bucket), not
    a single poi_new partition — no 'No Partition Defined' funnels."""
    import io
    import contextlib

    import __spark_entry__ as entry_mod

    df = entry_mod._q_osm_xml_render(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    saw_bucketed = False
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            if "poi_code" in line and "seq" in line:
                continue  # 45-row poi_common dim dedup — fine at any scale
            assert "_gb" in line, line
            saw_bucketed = True
    assert saw_bucketed, "expected the bucketed numbering window in the plan"


def test_global_rank_by_matches_single_window(spark):
    """Two-phase global_rank_by == the partitionless-window rank, for
    arbitrary (string, nulls-first) total orders."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.plans.export import global_rank_by

    rows = [
        (i, c, s)
        for i, (c, s) in enumerate(
            [("b", "x"), (None, "y"), ("a", None), ("b", "a"), ("a", "z"),
             ("c", "c"), (None, None), ("a", "z"), ("b", "x"), ("a", "a")] * 7
        )
    ]
    df = spark.createDataFrame(rows, "id long, city string, street string")
    order = [
        F.col("city").asc_nulls_first(),
        F.col("street").asc_nulls_first(),
        F.col("id").asc(),
    ]
    got = {
        r["id"]: r["rn"]
        for r in global_rank_by(df, order, out="rn", num_ranges=8).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(Window.orderBy(*order))).collect()
    }
    assert got == want

"""Streaming point-in-polygon == batch point_in_polygon across
micro-batch boundaries, zero streaming state — including multi-ring
(hole) polygons and the ORDER BY name first-hit rule."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.pip import point_in_polygon
from osm_poi_matchmaker_spark.streaming.pip import pip_stream
from tests.conftest import SF_SMALL as SF


def test_stream_pip_matches_batch(spark, tmp_path):
    # districts + metro + the donut county/enclave pair in ONE snapshot:
    # overlap, concavity and holes all live in the same resolve
    polys = synth.district_polygons_df(spark, SF).unionAll(
        synth.enclave_polygons_df(spark).select(
            (F.col("poly_id") + 100).alias("poly_id"), "name", "way_wkt"
        )
    )
    pages = (
        entry_mod._pages_geo(spark, SF)
        .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select("page_id", "lat", "lon")
    )
    want = {
        r["page_id"]: r["poly_id"]
        for r in point_in_polygon(pages, polys, order_by="name").collect()
    }
    n_pages = pages.count()
    assert len(set(want.values())) >= 4  # misses + several polygons win

    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    for name, part in (
        ("a", pages.where(F.col("page_id") % 2 == 0)),
        ("b", pages.where(F.col("page_id") % 2 != 0)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    pip_stream(
        spark, str(stream_dir), pages.schema, polys, out_dir, ckpt,
        order_by="name", max_files_per_trigger=1,
    )
    got = {
        r["page_id"]: r["poly_id"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == n_pages  # one verdict per page, misses included
    assert got == want  # winner, overlap rule and hole handling identical

    # resume over the same checkpoint: nothing new, no duplicate verdicts
    pip_stream(
        spark, str(stream_dir), pages.schema, polys, out_dir, ckpt,
        order_by="name", max_files_per_trigger=1,
    )
    assert len(spark.read.parquet(out_dir).collect()) == n_pages

"""Streaming nearest-POI assignment == batch nearest_poi (k=1) across
micro-batch boundaries, zero streaming state (stream-static joins)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.knn import nearest_poi
from osm_poi_matchmaker_spark.streaming.knn import nearest_poi_stream
from tests.conftest import SF_SMALL as SF

RADIUS = 250.0


def test_stream_nearest_matches_batch(spark, tmp_path):
    pois = synth.osm_pois(spark, SF).select("osm_id", "lat", "lon")
    pages = (
        entry_mod._pages_geo(spark, SF)
        .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select("page_id", "lat", "lon")
    )

    hits = nearest_poi(pages, pois, RADIUS, k=1)
    want = {
        r["page_id"]: (r["osm_id"], round(r["distance"], 2))
        for r in hits.collect()
    }
    n_pages = pages.count()
    assert 0 < len(want) < n_pages, "need both hits and misses"

    # two arrival files -> two micro-batches with maxFilesPerTrigger=1
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
    nearest_poi_stream(
        spark, str(stream_dir), pages.schema, pois, out_dir, ckpt,
        radius_m=RADIUS, max_files_per_trigger=1,
    )

    got_rows = spark.read.parquet(out_dir).collect()
    assert len(got_rows) == n_pages  # one verdict per page, misses included
    got_hits = {
        r["page_id"]: (r["osm_id"], r["distance_m"])
        for r in got_rows
        if r["osm_id"] is not None
    }
    assert got_hits == want  # winner AND tie-break identical to batch

    # resume over the same checkpoint: nothing new, no duplicate verdicts
    nearest_poi_stream(
        spark, str(stream_dir), pages.schema, pois, out_dir, ckpt,
        radius_m=RADIUS, max_files_per_trigger=1,
    )
    assert len(spark.read.parquet(out_dir).collect()) == n_pages

"""Streaming crawl ingest == batch match, across micro-batch boundaries.

Pages arrive as two separate files with maxFilesPerTrigger=1, so the
match cascade runs in (at least) two micro-batches; the appended union
must equal the one-shot batch result row-for-row, and a second stream
run over the same checkpoint must process nothing new (resume/idempotency
via the streaming commit log).
"""

from __future__ import annotations

import glob
import shutil

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.extract.geotag import geotag_pages
from osm_poi_matchmaker_spark.operators.match import match_pages
from tests.conftest import SF_SMALL as SF


def _key(r):
    return (r["page_id"], r["osm_id"], r["node_type"], r["stage"],
            r["priority"], None if r["distance"] is None else round(r["distance"], 6),
            r["poi_new"])


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    from osm_poi_matchmaker_spark.streaming.crawl import match_crawl_stream

    pages = synth.pages(spark, SF)
    pois = synth.osm_pois(spark, SF)
    common = synth.poi_common_df(spark)

    expected = {
        _key(r)
        for r in match_pages(
            geotag_pages(pages), pois, common, brand_rows=synth.BRAND_ROWS
        ).collect()
    }
    assert expected

    # two arrival files split by page_id parity → two micro-batches
    stream_dir = tmp_path / "pages_stream"
    stream_dir.mkdir()
    from pyspark.sql import functions as F

    for name, part in (
        ("a", pages.where(F.col("page_id") % 2 == 0)),
        ("b", pages.where(F.col("page_id") % 2 == 1)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "matched")
    ckpt = str(tmp_path / "ckpt")
    match_crawl_stream(
        spark, str(stream_dir), pages.schema, pois, common, out_dir, ckpt,
        brand_rows=synth.BRAND_ROWS, max_files_per_trigger=1,
    )

    got_rows = spark.read.parquet(out_dir).collect()
    assert {_key(r) for r in got_rows} == expected
    assert len(got_rows) == len(expected), "no duplicate appends"

    # resume over the same checkpoint: nothing new to process, no re-append
    match_crawl_stream(
        spark, str(stream_dir), pages.schema, pois, common, out_dir, ckpt,
        brand_rows=synth.BRAND_ROWS, max_files_per_trigger=1,
    )
    assert len(spark.read.parquet(out_dir).collect()) == len(expected)

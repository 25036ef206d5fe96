"""Streaming exact dedup: one survivor per distinct text across
micro-batch boundaries, duplicates dropped, resume processes nothing."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.streaming.dedup import exact_dedup_stream
from tests.conftest import SF_SMALL as SF


def test_stream_dedup_one_survivor_per_text(spark, tmp_path):
    pages = synth.pages(spark, SF).select("url", "warc_ts", "text")
    # duplicate every page under a mirror URL so every text has >=2 copies
    mirrored = pages.withColumn("url", F.concat(F.lit("mirror://"), "url"))
    both = pages.union(mirrored)
    n_distinct = pages.select("text").distinct().count()

    # two arrival files (originals then mirrors) -> >=2 micro-batches with
    # maxFilesPerTrigger=1: the dedup state must survive the batch boundary
    stream_dir = tmp_path / "pages_stream"
    stream_dir.mkdir()
    for name, part in (("a", pages), ("b", mirrored)):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")
    exact_dedup_stream(
        spark, str(stream_dir), both.schema, out_dir, ckpt,
        max_files_per_trigger=1,
    )

    got = spark.read.parquet(out_dir)
    assert got.count() == n_distinct
    assert got.select("text").distinct().count() == n_distinct
    # arrival order: file a (originals) lands first, so no mirror URL wins
    assert got.where(F.col("url").startswith("mirror://")).count() == 0
    # schema passes through unchanged (the hash column is internal)
    assert set(got.columns) == {"url", "warc_ts", "text"}

    # resume over the same checkpoint: commit log says nothing new
    exact_dedup_stream(
        spark, str(stream_dir), both.schema, out_dir, ckpt,
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(out_dir).count() == n_distinct

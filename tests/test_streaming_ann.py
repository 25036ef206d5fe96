"""Streaming ANN probe == batch ivf_topk, across micro-batch
boundaries, with zero streaming state (broadcast one-row index, row-
local routing/ranking only)."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.similarity import ivf_topk
from osm_poi_matchmaker_spark.streaming.ann import ann_probe_stream
from tests.conftest import SF_SMALL as SF


def test_stream_ann_probe_matches_batch(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") % 50 == 0)

    want = {
        (r["query_id"], r["rank"]): (r["match_id"], r["cosine_sim"])
        for r in ivf_topk(queries, emb, k=5, centroid_mod=100, nprobe=2).collect()
    }
    assert want, "batch twin returned nothing"

    # two arrival files -> two micro-batches with maxFilesPerTrigger=1
    stream_dir = tmp_path / "queries_stream"
    stream_dir.mkdir()
    for name, part in (
        ("a", queries.where(F.col("vec_id") % 100 == 0)),
        ("b", queries.where(F.col("vec_id") % 100 != 0)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "results")
    ckpt = str(tmp_path / "ckpt")
    ann_probe_stream(
        spark, str(stream_dir), queries.schema, emb, out_dir, ckpt,
        k=5, centroid_mod=100, nprobe=2, max_files_per_trigger=1,
    )

    got_rows = spark.read.parquet(out_dir).collect()
    got = {
        (r["query_id"], r["rank"]): (r["match_id"], r["cosine_sim"])
        for r in got_rows
    }
    assert len(got_rows) == len(got) == len(want)
    assert got == want

    # resume over the same checkpoint: nothing new, no duplicate rows
    ann_probe_stream(
        spark, str(stream_dir), queries.schema, emb, out_dir, ckpt,
        k=5, centroid_mod=100, nprobe=2, max_files_per_trigger=1,
    )
    assert spark.read.parquet(out_dir).count() == len(want)


def test_stream_ann_empty_corpus_refused(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    with pytest.raises(ValueError, match="no centroids"):
        ann_probe_stream(
            spark,
            str(tmp_path / "in"),
            emb.schema,
            emb.where(F.lit(False)),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )

"""Streaming semantic probe == batch semantic_index_probe, across
micro-batch boundaries, with zero streaming state (stream-static joins
plus row-local array math only)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.similarity import semantic_index_probe
from osm_poi_matchmaker_spark.streaming.semantic import semantic_probe_stream
from tests.conftest import SF_SMALL as SF


def test_stream_semantic_probe_matches_batch(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F.col("vec_id") % 7 != 0)
    batch = emb.where(F.col("vec_id") % 7 == 0)

    want = {
        r["vec_id"]: (r["centroid_id"], r["is_known_dup"], r["matched_id"])
        for r in semantic_index_probe(corpus, batch).collect()
    }
    assert any(v[1] for v in want.values()), "fixture has no known dups"
    assert not all(v[1] for v in want.values()), "fixture is all dups"

    # two arrival files -> two micro-batches with maxFilesPerTrigger=1
    stream_dir = tmp_path / "batch_stream"
    stream_dir.mkdir()
    for name, part in (
        ("a", batch.where(F.col("vec_id") % 2 == 0)),
        ("b", batch.where(F.col("vec_id") % 2 != 0)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    semantic_probe_stream(
        spark, str(stream_dir), batch.schema, corpus, out_dir, ckpt,
        max_files_per_trigger=1,
    )

    got_rows = spark.read.parquet(out_dir).collect()
    got = {
        r["vec_id"]: (r["centroid_id"], r["is_known_dup"], r["matched_id"])
        for r in got_rows
    }
    assert len(got_rows) == len(got) == len(want)  # one verdict per vector
    assert got == want

    # resume over the same checkpoint: nothing new, no duplicate verdicts
    semantic_probe_stream(
        spark, str(stream_dir), batch.schema, corpus, out_dir, ckpt,
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(out_dir).count() == len(want)


def test_empty_corpus_contract_pinned(spark, tmp_path):
    """Empty-corpus contract of both twins (VERDICT r4 ask #3): the batch
    probe returns zero rows when no centroid exists, and the streaming
    twin refuses to start rather than silently emitting NULL-centroid
    verdicts for every arriving vector."""
    import pytest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    batch = emb.limit(4)
    empty_corpus = emb.where(F.lit(False))

    assert semantic_index_probe(empty_corpus, batch).count() == 0

    with pytest.raises(ValueError, match="no centroids"):
        semantic_probe_stream(
            spark,
            str(tmp_path / "in"),
            batch.schema,
            empty_corpus,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )

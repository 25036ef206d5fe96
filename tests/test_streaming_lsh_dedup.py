"""Streaming LSH bucket-claim dedup: the stream's claim rollup must equal
the batch twin (operators/dedup.lsh_arrival_dedup) when arrival order is
monotone in doc_id, including near-dups that straddle a micro-batch
boundary (state survives the boundary)."""

from __future__ import annotations

import glob
import shutil

from osm_poi_matchmaker_spark.operators.dedup import band_signatures, lsh_arrival_dedup
from osm_poi_matchmaker_spark.streaming.dedup import (
    band_structs_expr,
    claims_to_verdicts,
    lsh_dedup_stream,
)

from pyspark.sql import functions as F


def _corpus(spark):
    rows = []
    for i in range(10):
        rows.append((i, " ".join(f"w{(i * 7 + j) % 31}" for j in range(12))))
    # 10..13 near-duplicate 0..3 (identical text -> identical signatures);
    # they arrive in the SECOND file, so the claim must come from state
    for i in range(4):
        rows.append((10 + i, rows[i][1]))
    rows.append((14, "xx"))  # too short for 3-gram shingles -> no bands
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_structs_expr_matches_batch(spark):
    docs = _corpus(spark)
    row_wise = docs.select(
        "doc_id", F.explode(band_structs_expr(F.col("text"))).alias("b")
    ).select("doc_id", "b.band", "b.band_sig")
    a = {(r["doc_id"], r["band"]): r["band_sig"] for r in row_wise.collect()}
    b = {(r["doc_id"], r["band"]): r["band_sig"] for r in band_signatures(docs).collect()}
    assert a == b


def test_stream_equals_batch_twin(spark, tmp_path):
    docs = _corpus(spark)
    first = docs.where("doc_id < 10")
    second = docs.where("doc_id >= 10")

    stream_dir = tmp_path / "pages_stream"
    stream_dir.mkdir()
    for name, part in (("a", first), ("b", second)):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    claims_dir = str(tmp_path / "claims")
    lsh_dedup_stream(
        spark, str(stream_dir), docs.schema, claims_dir, str(tmp_path / "ckpt"),
        key="doc_id", max_files_per_trigger=1,
    )
    claims = spark.read.parquet(claims_dir)
    got = {
        r["doc_id"]: (r["dup_of"], r["is_duplicate"])
        for r in claims_to_verdicts(docs, claims, key="doc_id").collect()
    }
    want = {
        r["doc_id"]: (r["dup_of"], r["is_duplicate"])
        for r in lsh_arrival_dedup(docs).collect()
    }
    assert got == want
    # the cross-batch near-dups were actually flagged (state survived)
    for i in range(4):
        assert got[10 + i] == (i, True)
    # shingle-less doc survives
    assert got[14] == (14, False)

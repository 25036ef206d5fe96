"""Multimodal plumbing tests: schema shape, deterministic stub features,
frame-sampling explode arithmetic."""

from __future__ import annotations

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_and_featurize,
    frame_sample,
    synth_assets,
)

SF = "/root/testdata/sf0.001"


def test_decode_features_deterministic(spark):
    assets = synth_assets(synth.pages(spark, SF)).limit(20)
    a = {r["asset_id"]: r["feature"] for r in decode_and_featurize(assets).collect()}
    b = {r["asset_id"]: r["feature"] for r in decode_and_featurize(assets).collect()}
    assert a == b
    vec = next(iter(a.values()))
    assert len(vec) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in vec)


def test_decode_schema(spark):
    out = decode_and_featurize(synth_assets(synth.pages(spark, SF)).limit(5))
    assert [f.name for f in out.schema] == ["asset_id", "kind", "width", "height", "feature"]
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["width"] is not None for r in rows)


def test_frame_sample_counts(spark):
    assets = synth_assets(synth.pages(spark, SF))
    videos = {r["asset_id"]: r["meta"]["n_frames"] for r in assets.where("kind = 'video'").collect()}
    counts = (
        frame_sample(assets, every_nth=8)
        .groupBy("asset_id")
        .count()
        .collect()
    )
    for r in counts:
        n_frames = videos[r["asset_id"]]
        expected = (max(n_frames - 1, 0)) // 8 + 1
        assert r["count"] == expected

"""Checkpoint/resume + streaming smoke tests."""

from __future__ import annotations

import json
import os

from osm_poi_matchmaker_spark.plans.pipeline import build_poi_pipeline

SF = "/root/testdata/sf0.001"


def test_pipeline_runs_and_resumes(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    pipe = build_poi_pipeline(root, SF)

    out1 = pipe.run(spark)
    assert pipe.executed == ["extract", "match", "export_prep"]
    n_match = out1["match"].count()
    assert n_match > 0

    # warm resume: nothing recomputes, same data comes back
    pipe2 = build_poi_pipeline(root, SF)
    out2 = pipe2.run(spark)
    assert pipe2.executed == []
    assert out2["match"].count() == n_match

    # lineage rows landed next to the match checkpoint
    lineage = spark.read.parquet(os.path.join(root, "match", "lineage"))
    assert lineage.count() > 0
    cols = set(lineage.columns)
    assert {"cell_bucket", "cell_min", "cell_max", "input_rows", "matched_rows"} <= cols

    # manifest sanity
    with open(os.path.join(root, "match", "manifest.json")) as f:
        man = json.load(f)
    assert man["rows"] == n_match

    # version bump on stage 2 → stages 2..3 recompute, stage 1 stays warm
    pipe3 = build_poi_pipeline(root, SF)
    pipe3.stages[1].version = "2"
    pipe3.run(spark)
    assert pipe3.executed == ["match", "export_prep"]


def test_streaming_windowed_events(spark, tmp_path):
    import shutil

    from osm_poi_matchmaker_spark.streaming.events import (
        run_stream_once,
        windowed_event_stats,
    )

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", stream_dir / "events.parquet")

    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(batch).collect()
    }

    run_stream_once(spark, str(stream_dir), batch.schema, out_table="event_stats_test")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("event_stats_test").collect()
    }
    assert got == expected

"""Streaming spatial probe == batch dbscan_assign_probe across
micro-batch boundaries, zero streaming state (stream-static joins)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.spatial_cluster import (
    dbscan_assign_probe,
    dbscan_clusters,
)
from osm_poi_matchmaker_spark.streaming.spatial import dbscan_probe_stream
from tests.conftest import SF_SMALL as SF


def test_stream_probe_matches_batch(spark, tmp_path):
    pois = synth.osm_pois(spark, SF)
    settled_pts = pois.where(F.col("osm_id") % 10 != 0)
    batch = pois.where(F.col("osm_id") % 10 == 0).select("osm_id", "lat", "lon")
    settled = dbscan_clusters(settled_pts, eps_m=400.0, min_pts=3).join(
        settled_pts.select("osm_id", "lat", "lon"), "osm_id"
    )

    want = {
        r["osm_id"]: (r["status"], r["cluster"])
        for r in dbscan_assign_probe(batch, settled, eps_m=400.0).collect()
    }
    assert any(v[0] == "assigned" for v in want.values()), "no assignments"
    assert any(v[0] == "unassigned" for v in want.values()), "no misses"

    # two arrival files -> two micro-batches with maxFilesPerTrigger=1
    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    for name, part in (
        ("a", batch.where(F.col("osm_id") % 20 == 0)),
        ("b", batch.where(F.col("osm_id") % 20 != 0)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(
            glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet"
        )

    out_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    dbscan_probe_stream(
        spark, str(stream_dir), batch.schema, settled, out_dir, ckpt,
        eps_m=400.0, max_files_per_trigger=1,
    )

    got_rows = spark.read.parquet(out_dir).collect()
    got = {r["osm_id"]: (r["status"], r["cluster"]) for r in got_rows}
    assert len(got_rows) == len(got) == len(want)  # one verdict per point
    assert got == want

    # resume over the same checkpoint: nothing new, no duplicate verdicts
    dbscan_probe_stream(
        spark, str(stream_dir), batch.schema, settled, out_dir, ckpt,
        eps_m=400.0, max_files_per_trigger=1,
    )
    assert spark.read.parquet(out_dir).count() == len(want)

"""Sessionization: built-in session_window (batch) vs the custom
applyInPandasWithState stateful sessionizer (stream, multi-micro-batch).

The stateful operator emits a session only when a later event of the same
user closes it — so the streamed result must equal the batch sessions
minus each user's final (still-open) session. Events are streamed as two
time-split files with maxFilesPerTrigger=1, forcing per-user state to
survive a micro-batch boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL as SF

GAP_MIN = 30


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    from osm_poi_matchmaker_spark.streaming.sessions import (
        run_sessionize_stream,
        sessionize_batch,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")

    batch = sessionize_batch(events, GAP_MIN)
    # closed sessions = all but each user's last (the stream can't know the
    # last one ended without a subsequent event)
    w = Window.partitionBy("user_id").orderBy(F.desc("session_start_s"))
    closed_expected = {
        tuple(r)
        for r in batch.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") > 1)
        .drop("rk")
        .collect()
    }
    assert closed_expected, "fixture must produce multiple sessions per user"

    # two time-split stream files (second half strictly after the first)
    import glob
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    med = events.select(F.median(ts_us).alias("m")).first()["m"]
    for name, part in (
        ("a", events.where(ts_us <= med)),
        ("b", events.where(ts_us > med)),
    ):
        out = tmp_path / f"part_{name}"
        part.coalesce(1).write.parquet(str(out))
        shutil.copy(glob.glob(f"{out}/part-*.parquet")[0], stream_dir / f"{name}.parquet")

    run_sessionize_stream(
        spark, str(stream_dir), events.schema, GAP_MIN, out_table="sessions_test"
    )
    got = {tuple(r) for r in spark.table("sessions_test").collect()}
    assert got == closed_expected

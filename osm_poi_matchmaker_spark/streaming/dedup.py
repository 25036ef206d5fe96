"""Streaming exact dedup over an append-only crawl.

A continuous crawl re-fetches the same pages (mirrors, redirects,
re-crawls), so the ingest edge needs dedup BEFORE the expensive
extract/match stages — the batch ``operators/dedup.exact_dedup`` runs
per release, this runs per micro-batch. (The reference's analogue is
the keyed get-or-create insert dedup, ``dao/data_handlers.py:220-312``,
which is inherently arrival-ordered — same idea, stream-shaped.)

Engine mechanics: ``dropDuplicatesWithinWatermark`` on the text hash
keeps the FIRST-arriving copy per key and holds per-key state only
until the event-time watermark passes, so state is bounded by (dedup
horizon × arrival rate), not by corpus size. The state key is the
16-byte md5 alone — at 10^12 docs and a 1-day horizon the store holds
one hash per *distinct* doc seen that day, sharded across executors by
the state-store partitioning; nothing ever scans the historical corpus.
Exact cross-release dedup (unbounded horizon) stays a batch job by
design — unbounded streaming state is the anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def exact_dedup_stream(
    spark: SparkSession,
    pages_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> None:
    """Append the first-arriving copy of every distinct ``text`` to
    ``out_dir``; duplicates arriving within ``watermark`` of event time
    (``warc_ts``) are dropped. availableNow trigger = batch-parity mode;
    a production stream drops the trigger and runs continuously,
    resuming from the streaming commit log in ``checkpoint_dir``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    deduped = (
        reader.parquet(pages_dir)
        .withColumn("text_hash", F.md5("text"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("text_hash")
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

"""Streaming crawl ingest: match newly-arrived pages per micro-batch.

The reference is a batch pipeline re-run from scratch per harvest
(``create_db.py:203-314``). At 10^12-document crawl scale the input is
append-only — new WARC segments land continuously — so the engine also
exposes the match stage as a Structured Streaming job: ``readStream``
over the pages table's directory, each micro-batch pushed through the
SAME ``geotag → tile → match_cascade`` plan via ``foreachBatch`` and
appended to the matched table.

Correctness note (why stream == batch exactly): the cascade winner is a
pure per-page function of that page and the (static, broadcast) POI
candidate side — no cross-page state — so any partition of the input
into micro-batches yields byte-identical union output. That invariant is
pinned by tests/test_streaming_match.py. (Operators with cross-row
state — dedup, sessionization — live in their own modules with explicit
watermark/state handling instead.)

At cluster scale the parquet file source is the stand-in for an Iceberg
incremental read of snapshot deltas; checkpointLocation carries the
already-processed file manifest so a killed stream resumes without
re-matching old segments (the same resumability story as
plans/checkpoint.py, driven by Spark's own streaming commit log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extract.geotag import geotag_pages
from ..operators.match import match_pages


def match_crawl_stream(
    spark: SparkSession,
    pages_dir: str,
    schema,
    pois: DataFrame,
    common: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    brand_rows: list | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the match pipeline over an append-only pages directory until
    all currently-available files are processed (availableNow trigger —
    the batch-parity mode; a production stream drops the trigger and
    runs continuously)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        matched = match_pages(
            geotag_pages(batch_df), pois, common, brand_rows=brand_rows
        )
        matched.write.mode("append").parquet(out_dir)

    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

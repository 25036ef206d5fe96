"""Crawl snapshot delta: classify every URL across two crawl releases.

A continuous crawl republishes the corpus as snapshots; downstream
training-data builds want the delta, not the full corpus (refetch
scheduling, incremental dedup, changed-content re-extraction). This is
the set-level analogue of the reference's per-record get-or-create
upsert (``dao/data_handlers.py:220-312``: match on the key, compare the
payload hash, insert/update/skip) — re-expressed as ONE full-outer
equi-join instead of a row-at-a-time lookup loop.

Scale: a single shuffle on the canonical key for each side (AQE handles
skewed hosts); content comparison is on a fixed-width md5, never the
payload, so the wide ``text``/``html`` columns are pruned before the
shuffle — the join moves (key, 32-byte hash) per row, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    text: str = "text",
) -> DataFrame:
    """Full-outer diff of two snapshots on ``key``: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, content hash differs),
    ``unchanged``. Returns (key, status, old_hash, new_hash)."""
    a = old.select(F.col(key), F.md5(F.col(text)).alias("old_hash"))
    b = new.select(F.col(key), F.md5(F.col(text)).alias("new_hash"))
    joined = a.join(b, key, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(key, status.alias("status"), "old_hash", "new_hash")


def delta_rollup(delta: DataFrame) -> DataFrame:
    """Per-status counts — the metrics row a scheduler reads."""
    return delta.groupBy("status").agg(F.count(F.lit(1)).alias("n"))

"""Mega-cell skew handling: salted two-stage aggregation.

City-center cells hold orders of magnitude more pages than rural cells
(the synth generator reproduces this: 40% of pages land in a 4×6 km
hotspot). A single-stage ``groupBy(cell)`` sends every hot-cell row to one
reducer; salting splits each cell's rows across ``n_salts`` sub-keys for
the partial aggregate, then combines the (tiny) partials — the classic
two-stage shape the north_rule names. Results are bit-identical to the
unsalted aggregate for algebraic aggregates (counts/sums/min/max).

AQE's skew-join splitting handles the JOIN side; this handles the
AGGREGATE side, where AQE cannot split a single group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
    out: str = "n",
) -> DataFrame:
    """Two-stage count per ``key``: partial count per (key, salt) → sum.

    ``salt_source``: deterministic column to derive the salt from (defaults
    to a uniform random-ish spread via crc32 of the key — any spread works,
    determinism only matters for reproducible plans, not results).
    """
    salt = (
        (salt_source % n_salts)
        if salt_source is not None
        else F.crc32(F.col(key).cast("string")) % n_salts
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(out))

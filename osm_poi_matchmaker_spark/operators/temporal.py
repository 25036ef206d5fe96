"""Temporal joins: as-of and range (interval) — beyond-reference operators.

The reference is purely batch-spatial and has neither operator
(SURVEY.md §2.3 J11: "not present"), but both are staples of a
training-data pipeline over event streams (attribution, windowed
labeling), and neither exists as a Spark SQL primitive — so each is
implemented as a composition of built-in DataFrame ops chosen for the
10^12-row regime.

As-of join — "for each left row, the latest right row at or before it":
the naive formulation (theta join on key + time inequality, then max per
left row) explodes quadratically within a key. Instead: tag the two
inputs, UNION them, and run one window per key ordered by (time, tag)
carrying the last non-null right-side values forward
(``last(..., ignorenulls=True)`` over unbounded-preceding). One shuffle
on the key, one per-key sort, zero intermediate blow-up — the same plan
Structured Streaming's state store would walk, expressed in batch.
Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), giving
inclusive (<=) as-of semantics, matching DuckDB's ``ASOF JOIN ... ON
l.t >= r.t`` oracle. Skew note: a mega-key serializes into one task's
sort; the degradation path is time-bucketing the key (process per
(key, day) with a per-bucket seed row carried from the previous bucket's
last right value — a second tiny pass), not salting, because as-of needs
the full per-key time order.

Range join — "points into variable intervals": the scalable form is the
time-axis analogue of the spatial tiling layer (tiling.py): intervals
explode into the fixed-width buckets they cover (``sequence`` of bucket
ids — bounded fan-out of ceil(len/W)+1 per interval), points carry their
single bucket, the join is a plain equi-join on (key, bucket), and the
exact containment predicate filters after. Pick W ≈ the typical interval
length so the fan-out is ~2×; at 10^12 points the point side again
crosses the join at one row each.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    carry: Sequence[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the ``carry`` columns of the
    latest ``right`` row with ``right_time <= left_time`` on the same
    ``keys`` (NULLs when no prior right row exists).

    Output: all ``left`` columns + ``{prefix}{c}`` for each carry column.
    """
    keys = list(keys)
    lcols = [c for c in left.columns if c not in keys and c != left_time]
    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_l"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in carry],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"{prefix}{c}") for c in carry],
    )
    # (time, tag) order puts right rows first at equal timestamps →
    # inclusive as-of; the carried struct keeps the carry columns from
    # one right row atomic (never mixes two right rows).
    carried = F.last(
        F.when(
            F.col("_is_l") == 0,
            F.struct(*[F.col(f"{prefix}{c}") for c in carry]),
        ),
        ignorenulls=True,
    ).over(
        Window.partitionBy(*keys)
        .orderBy("_t", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("_carried", carried)
        .where(F.col("_is_l") == 1)
        .select(
            *keys,
            F.col("_t").alias(left_time),
            *[F.col(c) for c in lcols],
            *[F.col(f"_carried.{prefix}{c}").alias(f"{prefix}{c}") for c in carry],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_time: str,
    start: str,
    end: str,
    bucket_width_s: int,
) -> DataFrame:
    """All (interval, point) pairs with ``start <= point_time < end`` on
    the same ``keys`` — half-open, the streaming-window convention.

    Columns of both inputs are carried through (callers project first;
    name collisions beyond ``keys`` are the caller's to avoid).
    """
    keys = list(keys)
    w = F.lit(int(bucket_width_s))
    p_bucket = (F.unix_timestamp(F.col(point_time)) / w).cast("long")
    i_buckets = F.sequence(
        (F.unix_timestamp(F.col(start)) / w).cast("long"),
        # end is exclusive, but a point in end's bucket can still precede
        # it — the bucket of the last representable instant is floor(end/W)
        (F.unix_timestamp(F.col(end)) / w).cast("long"),
    )
    pts = points.withColumn("_bucket", p_bucket)
    ivs = intervals.withColumn("_bucket", F.explode(i_buckets))
    return (
        pts.join(ivs, keys + ["_bucket"])
        .where((F.col(start) <= F.col(point_time)) & (F.col(point_time) < F.col(end)))
        .drop("_bucket")
    )

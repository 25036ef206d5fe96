"""Hand-built edge-case semantics for the temporal joins
(operators/temporal.py): as-of inclusivity/tie order, missing-prior
NULLs, range-join half-open boundaries and bucket-spanning intervals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_inclusive_ties_and_missing(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l-before-any"),  # no click yet → NULLs
            (1, _ts(20), "l-at-click"),  # equal ts → inclusive match
            (1, _ts(30), "l-after"),  # latest prior wins, not first
            (2, _ts(30), "l-other-key"),  # keys don't leak
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(20), 100),
            (1, _ts(25), 200),
            (2, _ts(5), 900),
        ],
        "user_id long, rts timestamp, rv long",
    )
    out = {
        r["tag"]: (r["r_rv"], r["r_rts"])
        for r in asof_join(
            left, right, keys=["user_id"], left_time="ts",
            right_time="rts", carry=["rv", "rts"],
        ).collect()
    }
    assert out["l-before-any"] == (None, None)
    assert out["l-at-click"] == (100, _ts(20))  # <= is inclusive
    assert out["l-after"] == (200, _ts(25))  # latest prior, not first
    assert out["l-other-key"] == (900, _ts(5))


def test_asof_carry_is_atomic(spark):
    # the carried struct must come from ONE right row — never mix the
    # rv of one with the rts of another
    left = spark.createDataFrame(
        [(1, _ts(50))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1), (1, _ts(40), 4)],
        "user_id long, rts timestamp, rv long",
    )
    row = asof_join(
        left, right, keys=["user_id"], left_time="ts",
        right_time="rts", carry=["rv", "rts"],
    ).collect()[0]
    assert (row["r_rv"], row["r_rts"]) == (4, _ts(40))


def test_range_join_half_open_and_bucket_span(spark):
    # interval [12:00, 12:30); bucket width 600 s → spans 4 buckets
    intervals = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(30))],
        "user_id long, iv_id long, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, 1, _ts(0)),  # == start → IN (closed start)
            (1, 2, _ts(29.983)),  # just inside
            (1, 3, _ts(30)),  # == end → OUT (open end)
            (1, 4, _ts(-0.017)),  # before start → OUT
            (2, 5, _ts(15)),  # other key → OUT
        ],
        "user_id long, pt_id long, ts timestamp",
    )
    got = sorted(
        r["pt_id"]
        for r in range_join(
            points, intervals, keys=["user_id"], point_time="ts",
            start="w_start", end="w_end", bucket_width_s=600,
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_matches_plain_theta_join(spark):
    # bucketed implementation == naive theta join on a small random-ish set
    intervals = spark.createDataFrame(
        [(u, 10 * u + i, _ts(7 * i + u), _ts(7 * i + u + 13))
         for u in (1, 2, 3) for i in range(8)],
        "user_id long, iv_id long, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [(u, 100 * u + j, _ts(j * 1.7 + u * 0.3)) for u in (1, 2, 4) for j in range(40)],
        "user_id long, pt_id long, ts timestamp",
    )
    fast = range_join(
        points, intervals, keys=["user_id"], point_time="ts",
        start="w_start", end="w_end", bucket_width_s=300,
    ).select("iv_id", "pt_id")
    slow = (
        points.join(intervals, "user_id")
        .where((F.col("w_start") <= F.col("ts")) & (F.col("ts") < F.col("w_end")))
        .select("iv_id", "pt_id")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))

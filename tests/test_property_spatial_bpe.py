"""Randomized-property checks (seeded, deterministic) for the session's
subtle kernels: the BPE column-expression merge fold vs the reference
greedy scan over arbitrary symbol streams, and ε-pair completeness of
the cell-ring self-join vs brute force over random Hungarian-extent
points (including cell-boundary adversaries the fixture tests can't
enumerate)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.bpe import _merge_fold


def _greedy(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_fold_matches_greedy_on_random_streams(spark):
    rng = random.Random(20260820)
    alpha = ["a", "b", "ab", "c"]
    cases = []
    for _ in range(300):
        syms = [rng.choice(alpha) for _ in range(rng.randint(1, 10))]
        cases.append((syms, rng.choice(alpha), rng.choice(alpha)))
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)], ["i", "syms"]
    ).persist()
    by_pair: dict[tuple[str, str], list[int]] = {}
    for i, (_, l, r) in enumerate(cases):
        by_pair.setdefault((l, r), []).append(i)
    got: dict[int, list[str]] = {}
    for (l, r), idxs in by_pair.items():
        for row in (
            df.where(F.col("i").isin(idxs))
            .select("i", _merge_fold(F.col("syms"), l, r).alias("m"))
            .collect()
        ):
            got[row["i"]] = list(row["m"])
    for i, (syms, l, r) in enumerate(cases):
        assert got[i] == _greedy(syms, l, r), (syms, l, r)


def _hav(a, b):
    (la1, lo1), (la2, lo2) = a, b
    r1, r2 = math.radians(la1), math.radians(la2)
    dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
    x = math.sin(dla) ** 2 + math.cos(r1) * math.cos(r2) * math.sin(dlo) ** 2
    return 2 * 6371000.0 * math.asin(math.sqrt(x))


def test_pair_completeness_random_vs_brute_force(spark):
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        distance_band_pairs,
    )

    rng = random.Random(40926)
    eps = 400.0
    pts: dict[int, tuple[float, float]] = {}
    i = 0
    # 40 sprinkled clusters: a seed point plus jittered companions at
    # 0-800 m — half the companion pairs straddle the ε boundary, and
    # jitters land on arbitrary cell-edge offsets.
    for _ in range(40):
        la = rng.uniform(45.9, 48.5)
        lo = rng.uniform(16.1, 22.8)
        pts[i] = (la, lo)
        i += 1
        for _ in range(rng.randint(1, 4)):
            pts[i] = (
                la + rng.uniform(-0.0072, 0.0072),  # ±800 m lat
                lo + rng.uniform(-0.0106, 0.0106),  # ±800 m lon @47.5°
            )
            i += 1
    want = {
        (a, b)
        for a in pts
        for b in pts
        if a < b and _hav(pts[a], pts[b]) < eps
    }
    assert want, "fixture produced no ε-pairs"
    df = spark.createDataFrame(
        [(k, la, lo) for k, (la, lo) in pts.items()], ["osm_id", "lat", "lon"]
    )
    got = {(r["a"], r["b"]) for r in distance_band_pairs(df, eps).collect()}
    assert got == want

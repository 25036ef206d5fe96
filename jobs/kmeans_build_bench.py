#!/usr/bin/env python3
"""IVF build-cost bench: flat vs two-level centroid assignment at 1 M
vectors (VERDICT r4 ask #2).

Round 4 measured the N×√N flat assignment at 452 s for 1 M × 64-dim
(10⁹ scored pairs) — the dominant IVF build cost, same shape FAISS pays.
``similarity.assign_two_level`` routes each vector through ~∜N
super-centroids first and only ranks the ~√N/∜N centroids under the
``nprobe_super`` winning supers: ~N×(K/stride + nprobe_super·K/stride)
dots instead of N×K. This job measures both paths on the identical
corpus and reports their assignment agreement (two-level is approximate
in general; the synth-corpus equality is pinned by test_ann_kmeans, and
this prints the 1 M-corpus agreement so the recall risk is a read-off,
not a guess).

Both paths score pre-normalized unit vectors with a plain dot
(per-pair norm recompute would triple the array work — the
ivf_sq8_bench lesson) and aggregate with map-side max_by (no window
shuffle of the scored pairs).

Usage: python3 jobs/kmeans_build_bench.py [n_vectors] [cpus] [stride]
Prints ONE JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    stride = int(sys.argv[3]) if len(sys.argv) > 3 else max(2, round(n ** 0.25))
    dim = 64
    centroid_mod = max(2, round(n ** 0.5))  # ~√N lists

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.operators import similarity
    from osm_poi_matchmaker_spark.session import get_spark

    spark = get_spark("kmeans-build-bench", cpus=cpus, shuffle_partitions=cpus * 2)

    # Same hash-mixed generator as ivf_sq8_bench (full-mantissa floats).
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    elem = lambda vid, i: (  # noqa: E731
        (F.xxhash64(vid * F.lit(dim) + F.lit(i)) % 2000003) / F.lit(1000001.0)
        - F.lit(1.0)
    ).cast("float")
    vec = F.array(*[elem(F.col("vec_id"), i) for i in range(dim)])
    work = "/tmp/kmeans_build_bench"
    base.select("vec_id", vec.alias("embedding")).write.mode("overwrite").parquet(
        work
    )
    corpus = spark.read.parquet(work)

    # Pre-normalize ONCE; both paths score unit vectors with a plain dot.
    cnorm = (
        corpus.select(
            "vec_id", similarity.norm(F.col("embedding")).alias("_n"), "embedding"
        )
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / F.col("_n")).alias(
                "u"
            ),
        )
        .persist()
    )
    cnorm.count()
    cents_u = cnorm.where(F.col("vec_id") % centroid_mod == 1).select(
        F.col("vec_id").alias("centroid_id"), F.col("u").alias("cent_vec")
    ).persist()
    n_cents = cents_u.count()

    # ---- flat: N×K dots, map-side max_by (the round-4 452 s shape) ----
    t0 = time.time()
    flat = (
        cnorm.crossJoin(
            F.broadcast(
                cents_u.select("centroid_id", F.col("cent_vec").alias("cu"))
            )
        )
        .withColumn("cent_sim", similarity.dot(F.col("u"), F.col("cu")))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cent_sim"), (-F.col("centroid_id")).alias("negid"))
            ).alias("best")
        )
        .select("vec_id", (-F.col("best.negid")).alias("centroid_id"))
        .persist()
    )
    flat.count()
    t_flat = round(time.time() - t0, 1)

    # ---- two-level: ~N×(K/stride + 2·K/stride) dots, row-local ----
    t0 = time.time()
    two = (
        similarity.assign_two_level(
            cnorm,
            cents_u,
            key="vec_id",
            vec="u",
            super_stride=stride,
            nprobe_super=2,
            assume_normalized=True,
        )
        .select(F.col("vid").alias("vec_id"), F.col("centroid_id").alias("cid2"))
        .persist()
    )
    two.count()
    t_two = round(time.time() - t0, 1)

    agree = flat.join(two, "vec_id").where(
        F.col("centroid_id") == F.col("cid2")
    ).count()

    print(
        json.dumps(
            {
                "metric": "ivf_build_assignment_1m",
                "n_vectors": n,
                "dim": dim,
                "n_centroids": n_cents,
                "super_stride": stride,
                "flat_sec": t_flat,
                "two_level_sec": t_two,
                "speedup": round(t_flat / t_two, 2) if t_two else None,
                "agreement": round(agree / n, 6),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Connected-components scale bench (operators/dedup.connected_components).

The near-dup pair graphs that LSH/SimHash banding emit at 100 TB are
edge sets in the 10^7-10^9 range with two adversarial shapes: long
chains (transcluded/boilerplate page families, where naive min-label
propagation needs diameter rounds) and heavy stars (one boilerplate doc
near-duplicating millions). This job synthesizes both deterministically
and measures the operator: wall seconds, rounds to convergence, edges/s,
and a correctness checksum (component count + membership hash) that is
independent of the execution plan.

Graph: ``n_chains`` chains of ``chain_len`` nodes each, plus
``n_stars`` stars of ``star_size`` leaves; node ids are disjoint by
construction, so the expected component count is n_chains + n_stars —
the checksum is exact, no oracle run needed.

Prints ONE JSON line; paste into BENCH.md.

Usage: python3 jobs/components_bench.py [n_chains] [chain_len] [n_stars] [star_size] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_stars = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    star_size = int(sys.argv[4]) if len(sys.argv) > 4 else 5_000
    cpus = int(sys.argv[5]) if len(sys.argv) > 5 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.operators.dedup import connected_components
    from osm_poi_matchmaker_spark.session import get_spark

    spark = get_spark("components-bench", cpus=cpus, shuffle_partitions=cpus * 2)

    # chains: node ids [c*chain_len, (c+1)*chain_len); edge i -> i+1
    chain_nodes = n_chains * chain_len
    chains = (
        spark.range(chain_nodes)
        .where((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    # stars: hub h owns leaves; ids offset past the chain range
    star_base = chain_nodes
    leaves = spark.range(n_stars * star_size)
    stars = leaves.select(
        (F.lit(star_base) + (F.col("id") / star_size).cast("long") * (star_size + 1)
         ).alias("doc_a"),
        (F.lit(star_base) + (F.col("id") / star_size).cast("long") * (star_size + 1)
         + 1 + F.col("id") % star_size).alias("doc_b"),
    )
    pairs = chains.union(stars).repartition(cpus * 2).persist()
    n_edges = pairs.count()  # untimed: input materialization

    t0 = time.time()
    comp = connected_components(pairs)
    agg = comp.agg(
        F.countDistinct("component").alias("n_components"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.hash("node", "component").cast("long")).alias("membership_hash"),
    ).collect()[0]
    sec = time.time() - t0

    expected = n_chains + n_stars
    out = {
        "metric": "connected_components",
        "value": round(sec, 2),
        "unit": "sec",
        "edges": n_edges,
        "nodes": agg["n_nodes"],
        "components": agg["n_components"],
        "components_expected": expected,
        "correct": agg["n_components"] == expected,
        "membership_hash": agg["membership_hash"],
        "edges_per_sec": round(n_edges / sec, 1),
        "chain_len": chain_len,
        "star_size": star_size,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

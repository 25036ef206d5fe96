"""Host-level link-graph analytics: integer-exact PageRank.

The reference matches POIs page-by-page and has no notion of the crawl's
link structure; at 10^12-document scale the host graph is how a crawl
decides what to fetch and how to weight domains (spam-mass demotion,
frontier prioritization). PageRank is THE canonical iterative
distributed algorithm, so the implementation is deliberately
shuffle-shaped the way a 1000-executor run needs: each iteration is one
equi-join (edges x ranks, partitioned by src) plus one partial-agg
groupBy(dst) — no collect of the rank vector, no driver-side loop over
nodes. Only three scalar/tiny aggregates touch the driver (node count,
total weight, the distinct out-degree SET — bounded by degree diversity,
not graph size).

Exactness: ranks are BIGINTs in a unit that absorbs every division.
With damping d = dn/dd (default 17/20) and L = lcm of all out-degrees,
define U_i = N * W * (dd*L)^i (N nodes, W total start weight). Then

    R_0(v)     = weight(v) * N                       [exact: U_0 = N*W]
    R_{i+1}(v) = (dd-dn)*L*W*(dd*L)^i                [the (1-d)/N term]
               + dn * sum_{u->v} R_i(u) * (L // outdeg(u))

is integer-exact at every step (L // outdeg is exact by L's
construction; the base term needs NO division at all). Two engines
computing this recurrence agree bit-for-bit, which is what makes the
DuckDB oracle hashable — a floating PageRank would drift in the last
ulp with summation order. ``rank_frac`` divides two exactly-represented
(< 2^53) BIGINTs once, which IEEE-754 pins to the same double on both
engines.

Dangling nodes (out-degree 0) simply contribute nothing — their mass
decays toward the teleport term, the standard "sink drops mass"
simplification; the oracle does the same.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    damping: tuple[int, int] = (17, 20),
) -> DataFrame:
    """Integer-exact weighted-start PageRank over (node, weight) /
    (src, dst).

    Returns one row per node: ``node``, ``rank_num`` (BIGINT in unit
    U_k), ``rank_unit`` (the common denominator U_k, same on every
    row), ``rank_frac`` (rank_num / rank_unit as the one sanctioned
    double). ``sum(rank_num)`` == ``rank_unit`` minus dangling leakage.
    """
    dn, dd = damping
    if not (0 < dn < dd):
        raise ValueError("damping must be a proper positive fraction")

    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Tiny driver aggregates: |distinct outdegs| is bounded by degree
    # diversity (dozens even on the full web host graph), n/w are scalars.
    degs = [r["outdeg"] for r in outdeg.select("outdeg").distinct().collect()]
    row = nodes.agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    ).collect()[0]
    n, w = int(row["n"]), int(row["w"])
    if n == 0:
        raise ValueError("empty node set")
    lcm = math.lcm(*degs) if degs else 1

    growth = dd * lcm
    unit = n * w * growth**iterations
    # dn * R_i + base must stay inside signed 64-bit at every step;
    # sum(R_i) <= U_i so the per-node bound is U_k * dn.
    if unit * dn >= 2**62:
        raise OverflowError(
            f"rank unit {unit} * {dn} exceeds BIGINT headroom; lower "
            "iterations or damping denominator"
        )

    # (src, dst, mult) with mult = L // outdeg(src): the per-edge integer
    # share factor. Edges dominate the join input; outdeg is a same-key
    # self-aggregate so this join co-partitions on src.
    edges_m = edges.join(outdeg, "src").select(
        "src",
        "dst",
        F.expr(f"CAST({lcm} AS BIGINT) div outdeg").alias("mult"),
    )

    ranks = nodes.select(
        "node", (F.col("weight").cast("long") * F.lit(n)).alias("rank_num")
    )
    for i in range(iterations):
        base = (dd - dn) * lcm * w * growth**i
        contrib = (
            edges_m.join(ranks, edges_m.src == ranks.node)
            .select("dst", (F.col("rank_num") * F.col("mult")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.select("node")
            .join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.lit(dn) * F.coalesce(F.col("in_mass"), F.lit(0))
                ).alias("rank_num"),
            )
        )

    return ranks.select(
        "node",
        "rank_num",
        F.lit(unit).cast("long").alias("rank_unit"),
        (F.col("rank_num").cast("double") / F.lit(float(unit))).alias(
            "rank_frac"
        ),
    )

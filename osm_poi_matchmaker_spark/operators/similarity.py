"""Embedding similarity search (ANN) over ``array<float>`` columns.

Baseline: brute-force cosine top-k via built-in array expressions
(``zip_with`` dot product — JVM-side, no Python). Scale path: LSH-style
bucketing on sign-random-projections so candidate generation is a bucket
join instead of all-pairs (same structure as the tiling layer's cell join:
bucket key = quantized signature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side, score the whole
    corpus, per-query window. At 100 TB the corpus side stays partitioned;
    only queries broadcast. Self-matches (same key) are excluded.

    Returns (query_id, match_id, cosine_sim, rank).
    """
    q = queries.select(
        F.col(query_key).alias("query_id"), F.col(vec).alias("q_vec")
    )
    c = corpus.select(F.col(corpus_key).alias("match_id"), F.col(vec).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


# SRP plane-weight hash constants: Knuth's multiplicative constant +
# a quadratic plane term, mod 2^32. The previous family
# (((i+1)*(b+3)) % 7 < 4) had PERIOD 7 IN THE PLANE INDEX — only seven
# distinct hyperplanes existed, so adding bits or bands beyond 7 added
# pure repetition (measured recall@5 froze at 0.08 regardless of
# settings). This family gives distinct pseudo-random planes for every
# (plane, dim) in range; all arithmetic stays in int64 (max operand
# ~1.6e13) and is reproduced verbatim by the DuckDB oracle
# (oracles_docs._srp_sig).
_SRP_MULT = 2654435761
_SRP_QUAD = 40503
_SRP_MOD = 1 << 32
_SRP_HALF = 1 << 31


def srp_signature(vec: Column, dim: int, bits: int = 8, plane_offset: int = 0) -> Column:
    """Sign-random-projection signature without external randomness:
    plane p (globally indexed ``plane_offset + b``) uses deterministic
    ±1 weights ``w(p, i) = +1 iff ((i+1)*_SRP_MULT*(p+1) +
    _SRP_QUAD*(p+1)²) mod 2^32 < 2^31`` — fixed, engine-portable
    arithmetic. ``plane_offset`` gives multi-band callers (lsh_topk's
    OR-construction) disjoint plane sets per band. Returns a
    ``bits``-char '0'/'1' string bucket key."""
    def bit(b: int) -> Column:
        p1 = plane_offset + b + 1
        s = F.aggregate(
            F.transform(
                vec,
                lambda x, i: x.cast("double")
                * F.when(
                    ((i + 1) * F.lit(_SRP_MULT * p1) + F.lit(_SRP_QUAD * p1 * p1))
                    % F.lit(_SRP_MOD)
                    < F.lit(_SRP_HALF),
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(b) for b in range(bits)])


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    centroid_mod: int = 100,
    iters: int = 2,
    key: str = "vec_id",
    vec: str = "embedding",
    two_level: bool = False,
    super_stride: int = 4,
) -> DataFrame:
    """Fixed-iteration distributed Lloyd refinement of the modulo-seeded
    centroids (VERDICT r4 "Next round" #1): start from the deterministic
    ``key % centroid_mod == 1`` seeds every IVF path already uses, then run
    ``iters`` rounds of (assign to nearest centroid → per-cluster mean).
    Trained centroids buy recall at equal ``nprobe`` — the FAISS training
    step re-expressed as pure DataFrame work.

    Oracle-reproducible by construction, which is the whole trick:

    * fixed iteration count (no convergence test — no data-dependent
      control flow for an engine to diverge on);
    * assignment ties break (desc cosine, asc centroid_id) like every
      other ANN path, and the cosine fold is element-ordered double
      arithmetic both engines execute identically;
    * the MEAN is the one step where naive float summation would be
      aggregation-order-dependent (Spark partial aggregates sum in
      shuffle order; DuckDB in scan order). Components are therefore
      quantized to integer micro-units first — ``floor(x · 1e6)`` as
      BIGINT — summed exactly (integer addition commutes), and divided
      once: ``sum / (1e6 · n)``. Bit-identical on any engine, any
      partitioning, any core count; the 1e-6 quantization is far below
      any recall-relevant resolution.
    * empty clusters keep their previous centroid (left join + coalesce).

    Scale shape: centroids are ~√N rows and broadcast; each iteration is
    one assignment pass (broadcast join, no corpus shuffle) plus one
    groupBy(centroid_id) whose per-dim integer sums combine map-side, so
    the shuffle carries ~K·dim longs per map partition, not data. Each
    round's output (K rows) is persisted so round i+1 and the final
    consumer don't recompute the chain.

    With ``two_level=True`` the per-round assignment goes through
    :func:`assign_two_level` (every ``super_stride``-th centroid becomes a
    super-centroid; vectors route super-first) — the build-cost cut of
    VERDICT r4 ask #2. Default off: the oracle pins the exact one-level
    assignment, and the pytest equality check (test_ann_kmeans) is what
    licenses flipping it on at scale.

    Returns (centroid_id, cent_vec array<double>) — centroid ids remain
    the seed vec_ids, so downstream list/bucket naming is stable across
    retraining.
    """
    cents = corpus.where(F.col(key) % centroid_mod == 1).select(
        F.col(key).alias("centroid_id"), _to_double(F.col(vec)).alias("cent_vec")
    )
    for _ in range(iters):
        if two_level:
            assigned = assign_two_level(
                corpus, cents, key=key, vec=vec, super_stride=super_stride
            )
        else:
            assigned = _assign_to_centroids(corpus, cents, key, vec)
        sums = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor(
                        F.element_at("v", i + 1).cast("double") * F.lit(1_000_000.0)
                    ).cast("long")
                ).alias(f"_s{i}")
                for i in range(dim)
            ],
        )
        means = sums.select(
            "centroid_id",
            F.array(
                *[
                    F.col(f"_s{i}").cast("double")
                    / (F.lit(1_000_000.0) * F.col("n"))
                    for i in range(dim)
                ]
            ).alias("new_vec"),
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("new_vec", "cent_vec").alias("cent_vec"),
            )
            .persist()
        )
    return cents


def assign_two_level(
    vectors: DataFrame,
    cents: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    super_stride: int = 4,
    nprobe_super: int = 2,
    assume_normalized: bool = False,
) -> DataFrame:
    """Two-level nearest-centroid assignment (VERDICT r4 ask #2): route
    each vector to its ``nprobe_super`` nearest SUPER-centroids first
    (every ``super_stride``-th centroid by rank order — ~K/stride rows),
    then rank only the centroids grouped under those supers. Cuts the
    N×K flat assignment to ~N×(K/stride + nprobe_super·stride) cosine
    evaluations — at K=√N, stride=∜N this is the N×(∜N + √N/∜N) shape
    the round-4 verdict asked for.

    Approximate in general (the true nearest centroid may hang under an
    unprobed super); ``nprobe_super=2`` recovers exactness on the synth
    corpus (pinned by test_ann_kmeans's equality check), which is the
    evidence that licenses the fast path at build time. Same output
    schema as the flat assigner: (vid, v, centroid_id).

    SHUFFLE-FREE on the corpus side: the super set and the
    centroid→super map collapse to broadcast ONE-ROW arrays (the
    streaming/semantic.py shape), so routing and the final argmax are
    row-local array expressions inside whole-stage codegen — no
    exploded candidate rows cross an exchange, which is what makes
    this the build path at 10⁶+ vectors (a row_number window over
    N×candidates rows would shuffle the whole scored set).

    ``assume_normalized=True`` scores with a plain dot product
    (callers pass unit vectors) — skips the per-pair norm recompute
    that otherwise triples the higher-order-function work (the
    ivf_sq8_bench lesson).
    """
    sim = dot if assume_normalized else cosine
    # Supers: every super_stride-th centroid in centroid_id rank order —
    # deterministic, no new hyperparameter surface. INTENTIONAL
    # single-partition window: it runs over the CENTROID table (~√N
    # rows, broadcast-sized dim), never the corpus — do not copy this
    # shape to a corpus-scale plan (see plans/export.global_rank_by).
    w_rank = Window.orderBy(F.asc("centroid_id"))
    ranked = cents.select(
        "centroid_id", "cent_vec", F.row_number().over(w_rank).alias("_r")
    )
    supers = ranked.where((F.col("_r") % super_stride) == 1).select(
        F.col("centroid_id").alias("super_id"), F.col("cent_vec").alias("super_vec")
    )
    # Each centroid hangs under its nearest super (K×(K/stride) work on
    # the K-row centroid table; ties desc sim, asc super_id).
    w_c = Window.partitionBy("centroid_id").orderBy(
        F.desc("csim"), F.asc("super_id")
    )
    cent_map = (
        cents.crossJoin(F.broadcast(supers))
        .withColumn("csim", sim(F.col("cent_vec"), F.col("super_vec")))
        .withColumn("crank", F.row_number().over(w_c))
        .where(F.col("crank") == 1)
        .select("centroid_id", "cent_vec", "super_id")
    )
    sup_arr = supers.agg(
        F.array_sort(
            F.collect_list(F.struct("super_id", "super_vec"))
        ).alias("_sups")
    )
    # super_id → its centroids, as a one-row broadcast MAP: the lambda
    # bodies below then do only a map lookup / one dot per element.
    # (Expression-placement discipline: anything expensive must be a
    # higher-order-function ARGUMENT — evaluated once per row — never
    # sit inside a lambda body, where it re-evaluates per element;
    # measured 10× slower with the routing expression in the body.)
    cmap = (
        cent_map.groupBy("super_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "cent_vec"))
            ).alias("cs")
        )
        .agg(
            F.map_from_arrays(
                F.collect_list("super_id"), F.collect_list("cs")
            ).alias("_cmap")
        )
    )
    v = vectors.select(F.col(key).alias("vid"), F.col(vec).alias("v"))
    s = v.crossJoin(F.broadcast(sup_arr)).crossJoin(F.broadcast(cmap))
    # Row-local super routing: (-sim, super_id) sorts to (desc sim,
    # asc id) — identical tie semantics to the flat assigner's window.
    top_supers = F.slice(
        F.array_sort(
            F.transform(
                F.col("_sups"),
                lambda su: F.struct(
                    (-sim(F.col("v"), su.super_vec)).alias("negsim"),
                    su.super_id.alias("super_id"),
                ),
            )
        ),
        1,
        nprobe_super,
    )
    cands = F.flatten(
        F.transform(
            top_supers,
            lambda t: F.coalesce(
                F.element_at(F.col("_cmap"), t.super_id), F.array()
            ),
        )
    )
    best = F.array_max(
        F.transform(
            cands,
            lambda c: F.struct(
                sim(F.col("v"), c.cent_vec).alias("s"),
                (-c.centroid_id).alias("negid"),
            ),
        )
    )
    return s.select("vid", "v", (-best["negid"]).alias("centroid_id"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into inverted
    lists keyed by nearest centroid; a query probes only its ``nprobe``
    closest lists and ranks exactly inside them.

    Centroids are picked deterministically (``vec_id % centroid_mod == 1``)
    instead of k-means so the oracle can reproduce the exact lists — the
    scale structure (assign once, bucket the corpus by ``centroid_id``,
    probe few lists per query) is identical to a trained-centroid IVF; at
    100 TB the list assignment is a broadcast join against ~√N centroids
    and the corpus is written bucketed by ``centroid_id`` so probing is a
    partition-pruned scan, not a shuffle.

    ``cents`` overrides the modulo-seeded centroids with a trained set
    (:func:`kmeans_centroids`) — schema (centroid_id, cent_vec); the
    probe structure is identical either way.

    Returns (query_id, match_id, cosine_sim, rank).
    """
    if cents is None:
        cents = corpus.where(F.col(corpus_key) % centroid_mod == 1).select(
            F.col(corpus_key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    c = corpus.select(F.col(corpus_key).alias("match_id"), F.col(vec).alias("c_vec"))
    # Inverted-list assignment: nearest centroid per corpus vector.
    w_assign = Window.partitionBy("match_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("c_vec"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w_assign))
        .where(F.col("arank") == 1)
        .select("match_id", "c_vec", "centroid_id")
    )
    # Probe lists: nprobe nearest centroids per query.
    q = queries.select(F.col(query_key).alias("query_id"), F.col(vec).alias("q_vec"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def embedding_cosine_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    bits: int = 4,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, candidates
    restricted to the same SRP bucket (high-cosine pairs land in the same
    bucket with high probability; few sign bits keeps recall high). The
    bucket self-join replaces all-pairs — at 100 TB, bucket the vector
    table by ``sig`` and the join is co-located.

    Returns (vec_a, vec_b, cosine_sim) with vec_a < vec_b.
    """
    base = vectors.select(
        F.col(key), F.col(vec).alias("v"), srp_signature(F.col(vec), dim, bits).alias("sig")
    )
    a = base.select(F.col(key).alias("vec_a"), F.col("v").alias("va"), "sig")
    b = base.select(F.col(key).alias("vec_b"), F.col("v").alias("vb"), "sig")
    return (
        a.join(b, "sig")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 6,
    bands: int = 16,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via banded SRP-LSH (the AND-OR construction):
    ``bands`` independent ``bits``-plane signatures per vector; a corpus
    vector is a candidate iff it shares ANY band bucket with the query,
    then exact cosine ranks the candidates. One band (bands=1) is the
    single-bucket form; more bands raise recall (OR over bands), more
    bits sharpen each bucket (AND within a band) — exactly MinHash-LSH's
    banding knobs (operators/dedup.py), tuned with :func:`ann_recall`.
    Defaults (6 bits × 16 bands) measure recall@5 = 0.54 on the synth
    embeddings (vs 0.08 for the old single 8-bit bucket) while scoring
    ~22% of the corpus per query — see BENCH.md; IVF/SQ8 remain the
    recommended paths at higher recall.

    Scale shape: the corpus side explodes to ``bands`` rows, joins the
    (broadcast) query bands on (band, sig), and candidate pairs dedupe
    BEFORE scoring — each surviving pair is scored once. At 100 TB the
    corpus is written bucketed by (band, sig) so the probe is a pruned
    scan, not a shuffle.

    Returns (query_id, match_id, cosine_sim, rank) — approximate: vectors
    sharing no band bucket with the query are not considered.
    """
    def band_structs(v: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(g).alias("band"),
                    srp_signature(v, dim, bits, plane_offset=g * bits).alias("sig"),
                )
                for g in range(bands)
            ]
        )

    q = queries.select(
        F.col(query_key).alias("query_id"),
        F.col(vec).alias("q_vec"),
        F.explode(band_structs(F.col(vec))).alias("qb"),
    ).select("query_id", "q_vec", F.col("qb.band").alias("band"), F.col("qb.sig").alias("sig"))
    c = corpus.select(
        F.col(corpus_key).alias("match_id"),
        F.col(vec).alias("c_vec"),
        F.explode(band_structs(F.col(vec))).alias("cb"),
    ).select("match_id", "c_vec", F.col("cb.band").alias("band"), F.col("cb.sig").alias("sig"))
    cand = (
        c.join(F.broadcast(q), ["band", "sig"])
        .where(F.col("query_id") != F.col("match_id"))
        # a pair can collide in several bands — score it once
        .dropDuplicates(["query_id", "match_id"])
    )
    scored = cand.withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Top-k over an int8 scalar-quantized corpus (SQ8 + asymmetric
    distance, the FAISS ``SQ8`` layout re-expressed relationally).

    At 100 TB the embedding column IS the table: float32×dim per row.
    SQ8 stores one byte per dimension (4× smaller scans, shuffles and
    cache) at a small recall cost that :func:`ann_recall` makes
    measurable. Codes: per-DIMENSION global [min,max] over the corpus
    (one aggregate pass, broadcast back as two arrays), then
    ``floor((x-mn)/(mx-mn)*255+0.5)``. Scoring is asymmetric: the query
    stays full-precision, the corpus vector is reconstructed
    (``mn + code*(mx-mn)/255``) inside the scan — JVM-side array
    expressions end to end, no Python. Constant dimensions (mx==mn)
    reconstruct to mn exactly.

    Deterministic by construction (floor, not round-half-even), so the
    DuckDB oracle reproduces codes bit-exactly. Returns
    (query_id, match_id, cosine_sim, rank) like the other ANN paths.
    """
    # per-dim min/max: posexplode + groupBy(pos) — partial aggregation
    # ships dim rows per map partition, then dim tiny arrays broadcast.
    ex = corpus.select(F.posexplode(F.col(vec)).alias("pos", "x"))
    dims = (
        ex.groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn"))
            ).alias("_mns"),
            F.array_sort(
                F.collect_list(F.struct("pos", "mx"))
            ).alias("_mxs"),
        )
        .select(
            F.transform("_mns", lambda s: s.mn).alias("mn"),
            F.transform("_mxs", lambda s: s.mx).alias("mx"),
        )
    )
    c = corpus.select(
        F.col(corpus_key).alias("match_id"), F.col(vec).alias("c_vec")
    ).crossJoin(F.broadcast(dims))
    mn_i = lambda i: F.element_at(F.col("mn"), i + 1)  # noqa: E731
    mx_i = lambda i: F.element_at(F.col("mx"), i + 1)  # noqa: E731
    code = lambda x, i: F.floor(  # noqa: E731
        (x.cast("double") - mn_i(i)) / (mx_i(i) - mn_i(i)) * F.lit(255.0)
        + F.lit(0.5)
    )
    recon = F.transform(
        F.col("c_vec"),
        lambda x, i: F.when(
            mx_i(i) > mn_i(i),
            mn_i(i) + (code(x, i) * (mx_i(i) - mn_i(i))) / F.lit(255.0),
        ).otherwise(mn_i(i)),
    )
    c = c.select("match_id", recon.alias("r_vec"))

    q = queries.select(F.col(query_key).alias("query_id"), F.col(vec).alias("q_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("r_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank")
    )


def ivf_sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF × SQ8 composed (FAISS ``IVF,SQ8`` re-expressed relationally):
    inverted lists PRUNE (only ``nprobe`` lists per query are scanned)
    and the list payload is COMPRESSED (one int8 code per dimension, 4×
    smaller than float32) — the production ANN recommendation, replacing
    the either/or of :func:`ivf_topk` (prunes, full-precision payload)
    and :func:`sq8_topk` (compresses, scans everything). VERDICT r3
    "Next round" #2.

    Composition order matches FAISS: list ASSIGNMENT uses the
    full-precision vector against full-precision centroids (assignment
    happens at add time, before quantization); list STORAGE is the SQ8
    code; probe-time scoring is asymmetric — the query stays
    full-precision, the stored vector is reconstructed
    (``mn + code*(mx-mn)/255``) inside the scan. Codes use the same
    floor-exact per-dimension global [min,max] as :func:`sq8_topk`, so
    the DuckDB oracle reproduces them bit-identically.

    Scale shape: centroids (~√N rows) and the per-dim [mn,mx] arrays
    (2×dim doubles) broadcast; the corpus shuffles ONCE at write time
    (bucketed by ``centroid_id``, int8 payload); a probe reads
    nprobe/√N of a 4×-smaller table — both the scan-bytes and the
    candidate count shrink, multiplicatively.

    Returns (query_id, match_id, cosine_sim, rank); cosine is against
    the reconstruction, as in any asymmetric-distance index.
    """
    # per-dim [mn, mx] — one aggregate pass, broadcast back (sq8_topk's)
    ex = corpus.select(F.posexplode(F.col(vec)).alias("pos", "x"))
    dims = (
        ex.groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))).alias("_mns"),
            F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("_mxs"),
        )
        .select(
            F.transform("_mns", lambda s: s.mn).alias("mn"),
            F.transform("_mxs", lambda s: s.mx).alias("mx"),
        )
    )
    if cents is None:
        cents = corpus.where(F.col(corpus_key) % centroid_mod == 1).select(
            F.col(corpus_key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    # Inverted-list assignment at full precision; payload reconstructed
    # through the SQ8 code (what a stored int8 list yields at probe time).
    mn_i = lambda i: F.element_at(F.col("mn"), i + 1)  # noqa: E731
    mx_i = lambda i: F.element_at(F.col("mx"), i + 1)  # noqa: E731
    code = lambda x, i: F.floor(  # noqa: E731
        (x.cast("double") - mn_i(i)) / (mx_i(i) - mn_i(i)) * F.lit(255.0)
        + F.lit(0.5)
    )
    recon = F.transform(
        F.col("c_vec"),
        lambda x, i: F.when(
            mx_i(i) > mn_i(i),
            mn_i(i) + (code(x, i) * (mx_i(i) - mn_i(i))) / F.lit(255.0),
        ).otherwise(mn_i(i)),
    )
    w_assign = Window.partitionBy("match_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    assigned = (
        corpus.select(F.col(corpus_key).alias("match_id"), F.col(vec).alias("c_vec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("c_vec"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w_assign))
        .where(F.col("arank") == 1)
        .crossJoin(F.broadcast(dims))
        .select("match_id", recon.alias("r_vec"), "centroid_id")
    )
    q = queries.select(F.col(query_key).alias("query_id"), F.col(vec).alias("q_vec"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("r_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
        )
    )


def ivf_topk_filtered(
    queries: DataFrame,
    corpus: DataFrame,
    filter_col: str = "label",
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """FILTERED vector search (round 5): :func:`ivf_topk` with a
    metadata equality predicate — each query only matches corpus rows
    sharing its ``filter_col`` value (the tenant/language/category
    filter every production vector store bolts onto ANN). The filter
    rides the probe JOIN KEY — (centroid_id, filter value) — so
    non-matching candidates never materialize, rather than being
    post-filtered out of an already-scored top-k (post-filtering
    under-fills k whenever the filter is selective).

    Centroids stay global (the standard single-index design); at
    100 TB the corpus is written bucketed by (filter_col, centroid_id)
    and a filtered probe is a partition-pruned scan of one tenant's
    lists. Returns (query_id, match_id, cosine_sim, rank) — per-query
    rows can be fewer than k when the filtered list slice is small,
    which is the correct semantics.
    """
    if cents is None:
        cents = corpus.where(F.col(corpus_key) % centroid_mod == 1).select(
            F.col(corpus_key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    c = corpus.select(
        F.col(corpus_key).alias("match_id"),
        F.col(vec).alias("c_vec"),
        F.col(filter_col).alias("_fv"),
    )
    w_assign = Window.partitionBy("match_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("c_vec"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w_assign))
        .where(F.col("arank") == 1)
        .select("match_id", "c_vec", "_fv", "centroid_id")
    )
    q = queries.select(
        F.col(query_key).alias("query_id"),
        F.col(vec).alias("q_vec"),
        F.col(filter_col).alias("_fv"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "_fv", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), ["centroid_id", "_fv"])
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
        )
    )


def ivf_knn_join(
    vectors: DataFrame,
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Approximate kNN SELF-JOIN: top-k neighbors for EVERY vector, with
    candidate generation through the IVF lists instead of all-pairs —
    the batch shape semantic-dedup/recommendation backfills need (N×k
    output from ~N·nprobe·(N/K) scored pairs instead of N²).

    Both sides share ONE assignment pass; the probe side takes each
    vector's ``nprobe`` nearest lists and the join is a bucketed
    equi-join on ``centroid_id``. At 100 TB both sides read the same
    (centroid_id)-bucketed table — co-located, no shuffle beyond the
    ranking. Returns (query_id, match_id, cosine_sim, rank).
    """
    if cents is None:
        cents = vectors.where(F.col(key) % centroid_mod == 1).select(
            F.col(key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    v = vectors.select(F.col(key).alias("vid"), F.col(vec).alias("v"))
    w_rank = Window.partitionBy("vid").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    ranked = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("v"), F.col("cent_vec")))
        .withColumn("crank", F.row_number().over(w_rank))
        .where(F.col("crank") <= nprobe)
        .select("vid", "v", "centroid_id", "crank")
    )
    assigned = ranked.where(F.col("crank") == 1).select(
        F.col("vid").alias("match_id"), F.col("v").alias("c_vec"), "centroid_id"
    )
    probes = ranked.select(
        F.col("vid").alias("query_id"), F.col("v").alias("q_vec"), "centroid_id"
    )
    scored = (
        assigned.join(probes, "centroid_id")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "match_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
        )
    )


def ivf_index_stats(
    corpus: DataFrame,
    centroid_mod: int = 100,
    key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Index-health read-off: per-list occupancy of the IVF layout plus
    the imbalance factor FAISS reports (Σ size² · K / N² — 1.0 is
    perfectly balanced; probe cost scales with it, since a query pays
    the sizes of the lists it probes). Mega-lists are the embedding-
    space twin of the tiling layer's mega-cells: this is the read-off
    that says whether the salting/split treatment is needed BEFORE a
    probe-latency regression does. One groupBy over the assignment —
    partial-aggregated, K rows out.

    Returns one row per centroid (centroid_id, list_size, pct_of_corpus,
    imbalance_factor — the factor repeated per row so the frame stays a
    plain per-list table).
    """
    if cents is None:
        cents = corpus.where(F.col(key) % centroid_mod == 1).select(
            F.col(key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    assigned = _assign_to_centroids(corpus, cents, key, vec)
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("list_size")
    )
    totals = sizes.agg(
        F.sum("list_size").alias("_n"),
        F.count(F.lit(1)).alias("_k"),
        F.sum(F.col("list_size") * F.col("list_size")).alias("_ss"),
    )
    return sizes.crossJoin(F.broadcast(totals)).select(
        "centroid_id",
        "list_size",
        F.round(F.col("list_size") / F.col("_n"), 6).alias("pct_of_corpus"),
        F.round(
            F.col("_ss").cast("double") * F.col("_k") / (F.col("_n") * F.col("_n")),
            6,
        ).alias("imbalance_factor"),
    )


def ivf_index_append(
    corpus: DataFrame,
    batch: DataFrame,
    centroid_mod: int = 100,
    key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Incremental IVF ingest: assign an arriving batch to the SETTLED
    index's lists — centroids come from the corpus snapshot, cost is
    proportional to the BATCH (|batch| × K cosines against broadcast
    centroids), the corpus is never re-scanned or re-shuffled. The
    ANN-family member of the ``lsh_index_probe`` /
    ``semantic_index_probe`` ingest shape; at 100 TB the returned
    assignments append straight into the (centroid_id)-bucketed list
    table (a partition-local append — FAISS ``add`` semantics).

    Returns (vec_id, centroid_id, cent_sim) — the list each new vector
    joins and its similarity to that list's centroid (the routing
    confidence; a batch full of low cent_sim rows is the drift signal
    that says the centroids need retraining).
    """
    if cents is None:
        cents = corpus.where(F.col(key) % centroid_mod == 1).select(
            F.col(key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    w = Window.partitionBy("vid").orderBy(F.desc("cent_sim"), F.asc("centroid_id"))
    return (
        batch.select(F.col(key).alias("vid"), F.col(vec).alias("v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("v"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w))
        .where(F.col("arank") == 1)
        .select(
            F.col("vid").alias(key),
            "centroid_id",
            F.round("cent_sim", 6).alias("cent_sim"),
        )
    )


def _l2(a: Column, b: Column) -> Column:
    """Squared euclidean distance, element-ordered double fold (the PQ
    sub-assignment metric — FAISS PQ trains/assigns in L2)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    sub_mod: int = 31,
    iters: int = 2,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (FAISS ``PQ`` training re-expressed
    relationally): the vector splits into ``m`` contiguous subspaces of
    ``dim/m`` dimensions; each subspace gets its own codebook, seeded
    from the ``key % sub_mod == 1`` corpus rows' sub-vectors and refined
    by ``iters`` rounds of L2 Lloyd (assign each sub-vector to its
    nearest sub-centroid, then per-cluster mean). Same determinism
    contract as :func:`kmeans_centroids` — fixed iteration count,
    (asc distance, asc centroid_id) ties, integer micro-unit mean
    quantization — so the DuckDB oracle reproduces every codebook
    component bit-for-bit.

    Scale shape: codebooks are m×k rows of dim/m doubles (KB — always
    broadcast); per iteration the ASSIGNMENT is row-local array math
    against the broadcast codebook (no explode before the argmin), and
    the UPDATE shuffles one partially-aggregated row per
    (subspace, code) per map partition.

    Returns (subspace, centroid_id, cent_vec array<double>) —
    centroid ids remain the seed vec_ids.
    """
    d0 = dim // m
    if d0 * m != dim:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    seeds = corpus.where(F.col(key) % sub_mod == 1).select(
        F.col(key).alias("centroid_id"), _to_double(F.col(vec)).alias("_v")
    )
    if not seeds.limit(1).take(1):
        # An empty seed set would propagate as NULL codes and silently
        # garbage every downstream score (seen when a training subsample's
        # id residues don't intersect `% sub_mod == 1`). Fail loudly —
        # same contract as the streaming twins' empty-corpus refusal.
        raise ValueError(
            f"pq_codebooks: no seed rows ({key} % {sub_mod} == 1 selects "
            "none of the training corpus) — check the subsample scheme"
        )
    books = seeds.select(
        "centroid_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("subspace"),
                        F.slice("_v", s * d0 + 1, d0).alias("cent_vec"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("_e"),
    ).select(
        F.col("_e.subspace").alias("subspace"),
        "centroid_id",
        F.col("_e.cent_vec").alias("cent_vec"),
    )
    for _ in range(iters):
        codes = pq_encode(corpus, books, dim=dim, m=m, key=key, vec=vec)
        sub = codes.select(
            F.col("_vd").alias("v"),
            F.posexplode("codes").alias("subspace", "code"),
        ).select(
            "subspace",
            "code",
            *[
                F.element_at("v", F.col("subspace") * d0 + i + 1).alias(f"_x{i}")
                for i in range(d0)
            ],
        )
        sums = sub.groupBy("subspace", "code").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor(F.col(f"_x{i}") * F.lit(1_000_000.0)).cast("long")
                ).alias(f"_s{i}")
                for i in range(d0)
            ],
        )
        means = sums.select(
            "subspace",
            F.col("code").alias("centroid_id"),
            F.array(
                *[
                    F.col(f"_s{i}").cast("double")
                    / (F.lit(1_000_000.0) * F.col("n"))
                    for i in range(d0)
                ]
            ).alias("new_vec"),
        )
        books = (
            books.join(means, ["subspace", "centroid_id"], "left")
            .select(
                "subspace",
                "centroid_id",
                F.coalesce("new_vec", "cent_vec").alias("cent_vec"),
            )
            .persist()
        )
    return books


_PQ_KEYSPACE = 1_000_000  # subspace*keyspace + centroid_id map keys


def _books_map(books: DataFrame) -> DataFrame:
    """One-row broadcastable forms of a codebook: ``_bmap`` (subspace →
    sorted array of (centroid_id, cent_vec)) for the argmin, ``_bkv``
    (subspace·10⁶+centroid_id → cent_vec) for reconstruction."""
    bmap = (
        books.groupBy("subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "cent_vec"))
            ).alias("arr")
        )
        .agg(
            F.map_from_arrays(
                F.collect_list("subspace"), F.collect_list("arr")
            ).alias("_bmap")
        )
    )
    bkv = books.agg(
        F.map_from_arrays(
            F.collect_list(
                F.col("subspace").cast("long") * F.lit(_PQ_KEYSPACE)
                + F.col("centroid_id")
            ),
            F.collect_list("cent_vec"),
        ).alias("_bkv")
    )
    return bmap.crossJoin(bkv)


def pq_encode(
    corpus: DataFrame,
    books: DataFrame,
    dim: int,
    m: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` sub-centroid ids (the PQ code —
    m bytes at k≤256 where float32 storage is 4·dim). Row-local:
    the codebook broadcasts as a one-row map and the per-subspace
    argmin is an array expression (asc L2, asc centroid_id ties), so
    encoding is a projection — no join, no shuffle.

    Returns (key, _vd array<double>, codes array<int>)."""
    d0 = dim // m
    v = corpus.select(
        F.col(key), _to_double(F.col(vec)).alias("_vd")
    ).crossJoin(F.broadcast(_books_map(books).select("_bmap")))
    code_s = lambda s: -F.array_max(  # noqa: E731
        F.transform(
            F.element_at(F.col("_bmap"), s),
            lambda c: F.struct(
                (-_l2(F.slice(F.col("_vd"), s * d0 + 1, d0), c.cent_vec)).alias(
                    "negd"
                ),
                (-c.centroid_id).alias("negid"),
            ),
        )
    )["negid"]
    return v.select(
        key,
        "_vd",
        F.array(*[code_s(s).cast("int") for s in range(m)]).alias("codes"),
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    m: int = 8,
    sub_mod: int = 31,
    pq_iters: int = 2,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec: str = "embedding",
    cents: DataFrame | None = None,
    books: DataFrame | None = None,
    refine: int = 0,
) -> DataFrame:
    """IVF × PQ composed (FAISS ``IVF,PQ``): inverted lists PRUNE
    (nprobe lists per query) and the list payload is the m-byte PQ code
    — 4·dim/m × smaller than float32 (32× at dim=64, m=8), the deepest
    compression point of the ANN family (exact > SQ8 4× > PQ 32×), its
    recall cost made measurable by :func:`ann_recall`.

    Composition order matches FAISS: coarse ASSIGNMENT at full
    precision (pass trained ``cents`` from :func:`kmeans_centroids`
    for the full production composition); the stored payload is the PQ
    code; probe-time scoring is asymmetric — full-precision query
    against the code's reconstruction (concatenated sub-centroids).
    Everything deterministic, so the DuckDB oracle composes the
    trained-centroid chain and the codebook chain bit-identically.

    Scale shape: coarse centroids, codebooks and per-query probes all
    broadcast; the corpus shuffles once at write (bucketed by
    ``centroid_id``, m-byte payload); a probe reads nprobe/√N of a
    32×-smaller table.

    ``refine`` > 0 adds the FAISS ``IndexRefineFlat`` step: the PQ
    reconstruction only SHORTLISTS the top-``refine`` candidates per
    query; those rows' full-precision vectors are fetched (an id join —
    queries×refine rows, broadcast-sized) and re-ranked with exact
    cosine. Recovers the quantization's recall loss while the scan
    stays 32×-compressed — measured 0.40 → 0.62 recall@5 at refine=40
    on the synth embeddings (= the float-IVF number at equal nprobe:
    with refine the composed index loses nothing vs its prune-only
    parent).

    Returns (query_id, match_id, cosine_sim, rank); cosine is against
    the reconstruction when ``refine`` == 0, exact otherwise.
    """
    d0 = dim // m
    if cents is None:
        cents = corpus.where(F.col(corpus_key) % centroid_mod == 1).select(
            F.col(corpus_key).alias("centroid_id"), F.col(vec).alias("cent_vec")
        )
    if books is None:
        books = pq_codebooks(
            corpus, dim=dim, m=m, sub_mod=sub_mod, iters=pq_iters,
            key=corpus_key, vec=vec,
        )
    coded = pq_encode(corpus, books, dim=dim, m=m, key=corpus_key, vec=vec)
    # reconstruction: concat of each code's sub-centroid (row-local map
    # lookups on the broadcast codebook)
    recon = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.element_at(
                F.col("_bkv"),
                s.cast("long") * F.lit(_PQ_KEYSPACE)
                + F.element_at(F.col("codes"), s + 1).cast("long"),
            ),
        )
    )
    w_assign = Window.partitionBy("match_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    assigned = (
        coded.select(F.col(corpus_key).alias("match_id"), "_vd", "codes")
        .crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("_vd"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w_assign))
        .where(F.col("arank") == 1)
        .crossJoin(F.broadcast(_books_map(books).select("_bkv")))
        .select("match_id", recon.alias("r_vec"), "centroid_id")
    )
    q = queries.select(F.col(query_key).alias("query_id"), F.col(vec).alias("q_vec"))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("prank", F.row_number().over(w_probe))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("r_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("match_id"))
    if not refine:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id", "match_id",
                F.round("cosine_sim", 6).alias("cosine_sim"), "rank",
            )
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= refine)
        .select("query_id", "q_vec", "match_id")
    )
    full = corpus.select(
        F.col(corpus_key).alias("match_id"), F.col(vec).alias("f_vec")
    )
    rescored = full.join(F.broadcast(shortlist), "match_id").withColumn(
        "cosine_sim", cosine(F.col("q_vec"), F.col("f_vec"))
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "match_id",
            F.round("cosine_sim", 6).alias("cosine_sim"), "rank",
        )
    )


def ann_recall(exact: DataFrame, approx: DataFrame, method: str) -> DataFrame:
    """Evaluation harness: per-query recall@k of an approximate top-k
    (LSH / IVF) against the exact brute-force top-k — the measured error
    profile that turns (bits, nprobe, centroids) tuning from guesswork
    into a read-off, same role :func:`~.dedup.lsh_agreement` plays for
    MinHash banding. At 100 TB this runs on a sampled query shard; both
    inputs are already top-k-sized (k rows per query), so the join is
    trivial.

    Returns (query_id, method, n_exact, n_hits, recall).
    """
    e = exact.select("query_id", "match_id")
    a = approx.select("query_id", "match_id", F.lit(1).alias("_h"))
    return (
        e.join(a, ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("_h"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "query_id",
            F.lit(method).alias("method"),
            "n_exact",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_exact"), 6).alias("recall"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    centroid_mod: int = 100,
    threshold: float = 0.92,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    literature): cluster the embedding space, then drop items whose
    cosine to an earlier item IN THE SAME CLUSTER clears ``threshold``.
    The cluster assignment turns all-pairs cosine into per-cluster
    self-joins — the same contraction the cell grid gives the spatial
    eps-joins.

    Determinism contract (oracle-reproducible, no trained k-means):
    centroids are the ``vec_id % centroid_mod == 1`` vectors (the
    ivf_topk scheme); assignment ties break on ascending centroid id;
    the keep rule is "dominated by the MINIMUM earlier same-cluster id
    with cosine >= threshold" — greedy-by-id, the arrival-ordered
    LSH-dedup rule transplanted to embedding space.

    At 100 TB: centroid count scales ~sqrt(N) (broadcast dim), the
    corpus is written bucketed by ``centroid_id``, and the within-
    cluster self-join is co-located with bounded cluster cardinality —
    never all-pairs across clusters.

    Returns (vec_id, centroid_id, dup_of, is_duplicate); dup_of NULL for
    keepers.
    """
    cents = vectors.where(F.col(key) % centroid_mod == 1).select(
        F.col(key).alias("centroid_id"), F.col(vec).alias("cent_vec")
    )
    assigned = _assign_to_centroids(vectors, cents, key, vec)
    a = assigned.select(
        F.col("vid").alias("vid_a"), F.col("v").alias("va"), "centroid_id"
    )
    b = assigned.select(
        F.col("vid").alias("vid_b"), F.col("v").alias("vb"), "centroid_id"
    )
    dominators = (
        a.join(b, "centroid_id")
        .where(F.col("vid_a") < F.col("vid_b"))
        .withColumn("pair_sim", cosine(F.col("va"), F.col("vb")))
        .where(F.col("pair_sim") >= threshold)
        .groupBy("vid_b")
        .agg(F.min("vid_a").alias("dup_of"))
    )
    return (
        assigned.select("vid", "centroid_id")
        .join(dominators, assigned["vid"] == dominators["vid_b"], "left")
        .select(
            F.col("vid").alias(key),
            "centroid_id",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_duplicate"),
        )
    )


def _assign_to_centroids(
    vectors: DataFrame, cents: DataFrame, key: str, vec: str
) -> DataFrame:
    """Nearest-centroid assignment (desc cosine, asc centroid_id ties):
    (vid, v, centroid_id). ``cents`` must be (centroid_id, cent_vec)."""
    c = vectors.select(F.col(key).alias("vid"), F.col(vec).alias("v"))
    w_assign = Window.partitionBy("vid").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    return (
        c.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col("v"), F.col("cent_vec")))
        .withColumn("arank", F.row_number().over(w_assign))
        .where(F.col("arank") == 1)
        .select("vid", "v", "centroid_id")
    )


def semantic_index_probe(
    corpus: DataFrame,
    batch: DataFrame,
    centroid_mod: int = 100,
    threshold: float = 0.3,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Probe a SETTLED semantically-clustered corpus with a new embedding
    batch: the incremental-ingest form of :func:`semantic_dedup`, shaped
    like ``dedup.lsh_index_probe`` — ingest cost is proportional to the
    BATCH, never the corpus.

    Centroids come from the corpus (the ``vec_id % centroid_mod == 1``
    scheme); a batch vector is a known near-dup iff ANY settled member
    of its cluster clears ``threshold`` cosine, and ``matched_id`` is
    the minimum such corpus id. At 100 TB the corpus side is written
    bucketed by ``centroid_id`` so the probe join is a partition-pruned
    lookup.

    Returns (vec_id, centroid_id, is_known_dup, matched_id).
    """
    cents = corpus.where(F.col(key) % centroid_mod == 1).select(
        F.col(key).alias("centroid_id"), F.col(vec).alias("cent_vec")
    )
    settled = _assign_to_centroids(corpus, cents, key, vec).select(
        F.col("vid").alias("corpus_id"), F.col("v").alias("cv"), "centroid_id"
    )
    probes = _assign_to_centroids(batch, cents, key, vec)
    hits = (
        probes.join(settled, "centroid_id")
        .where(cosine(F.col("v"), F.col("cv")) >= threshold)
        .groupBy("vid")
        .agg(F.min("corpus_id").alias("matched_id"))
    )
    return (
        probes.select("vid", "centroid_id")
        .join(hits, "vid", "left")
        .select(
            F.col("vid").alias(key),
            "centroid_id",
            F.col("matched_id").isNotNull().alias("is_known_dup"),
            "matched_id",
        )
    )

"""Lloyd-trained IVF centroids (VERDICT r4 asks #1 and #2): training
buys recall at equal nprobe, the two-level assignment fast path is
output-identical on the synth corpus, and empty clusters keep their
previous centroid."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators import similarity as S
from tests.conftest import SF_SMALL as SF


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_kmeans_recall_beats_modulo_seeds(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk(q, emb).persist()
    base = S.ann_recall(exact, S.ivf_topk(q, emb, nprobe=2), "ivf")
    cents = S.kmeans_centroids(emb, dim=64, centroid_mod=100, iters=3)
    trained = S.ann_recall(
        exact, S.ivf_topk(q, emb, nprobe=2, cents=cents), "ivf_kmeans"
    )
    r_base = base.agg(F.avg("recall")).collect()[0][0]
    r_trained = trained.agg(F.avg("recall")).collect()[0][0]
    assert r_trained > r_base, (r_trained, r_base)
    exact.unpersist()


def test_two_level_assignment_identical(spark):
    """The build-cost fast path (super-first routing) must produce the
    exact flat-assignment output on the synth corpus — the evidence that
    licenses it at scale (oracle pins the flat path)."""
    emb = _emb(spark)
    cents = S.kmeans_centroids(emb, dim=64, centroid_mod=100, iters=3)
    flat = S._assign_to_centroids(emb, cents, "vec_id", "embedding").select(
        "vid", "centroid_id"
    )
    two = S.assign_two_level(emb, cents).select("vid", "centroid_id")
    assert flat.exceptAll(two).count() == 0
    assert two.exceptAll(flat).count() == 0


def test_kmeans_two_level_training_identical(spark):
    """kmeans_centroids(two_level=True) trains to the same centroids."""
    emb = _emb(spark)
    a = S.kmeans_centroids(emb, dim=64, centroid_mod=100, iters=3)
    b = S.kmeans_centroids(
        emb, dim=64, centroid_mod=100, iters=3, two_level=True
    )
    rows_a = {r["centroid_id"]: r["cent_vec"] for r in a.collect()}
    rows_b = {r["centroid_id"]: r["cent_vec"] for r in b.collect()}
    assert rows_a == rows_b


def test_kmeans_empty_cluster_keeps_seed(spark):
    """A centroid that attracts no vectors must survive unchanged (left
    join + coalesce), not vanish or go NULL. Corpus: two tight clusters
    on orthogonal directions (seeds 1 and 101) plus seed 201 pointing
    the opposite way from everything — every vector has strictly
    negative cosine to it, so its cluster is empty in every round."""
    a = [1.0] * 16 + [0.0] * 48
    b = [0.0] * 48 + [1.0] * 16
    c = [-1.0] * 64
    rows = (
        [(1, a), (101, b), (201, c)]
        + [(10 + i, [v * (1.0 + 0.1 * (i + 1)) for v in a]) for i in range(3)]
        + [(110 + i, [v * (1.0 + 0.1 * (i + 1)) for v in b]) for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cents = S.kmeans_centroids(df, dim=64, centroid_mod=100, iters=3)
    got = {r["centroid_id"]: r["cent_vec"] for r in cents.collect()}
    assert set(got) == {1, 101, 201}
    assert got[201] == c  # empty cluster: seed carried through
    assert got[1] != a  # non-empty cluster: mean moved


def test_pq_roundtrip_properties(spark):
    """PQ structural properties: one codebook per subspace, codes are
    valid codeword ids, empty codewords survive training, and the
    refine step strictly improves (or matches) shortlist-only recall."""
    emb = _emb(spark)
    books = S.pq_codebooks(emb, dim=64, m=8, sub_mod=5, iters=2)
    rows = books.collect()
    subs = {r["subspace"] for r in rows}
    assert subs == set(range(8))
    per_sub = {s: {r["centroid_id"] for r in rows if r["subspace"] == s} for s in subs}
    # every subspace keeps the full seed id set (empty codes survive)
    seed_ids = {r["vec_id"] for r in emb.where("vec_id % 5 = 1").collect()}
    for s in subs:
        assert per_sub[s] == seed_ids
    assert all(len(r["cent_vec"]) == 8 for r in rows)

    coded = S.pq_encode(emb, books, dim=64, m=8)
    crows = coded.select("vec_id", "codes").collect()
    assert all(len(r["codes"]) == 8 for r in crows)
    for r in crows[:50]:
        assert all(c in seed_ids for c in r["codes"])


def test_pq_refine_recovers_float_recall(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") % 50 == 0)
    exact = S.brute_force_topk(q, emb).persist()
    cents = S.kmeans_centroids(emb, dim=64, centroid_mod=100, iters=3)
    books = S.pq_codebooks(emb, dim=64, m=8, sub_mod=5, iters=2)

    def recall(df):
        return (
            S.ann_recall(exact, df, "x").agg(F.avg("recall")).collect()[0][0]
        )

    r_short = recall(
        S.ivf_pq_topk(q, emb, dim=64, nprobe=2, cents=cents, books=books)
    )
    r_refined = recall(
        S.ivf_pq_topk(
            q, emb, dim=64, nprobe=2, cents=cents, books=books, refine=40
        )
    )
    r_float = recall(S.ivf_topk(q, emb, nprobe=2, cents=cents))
    assert r_refined > r_short
    # refine recovers the float-IVF ceiling at equal nprobe
    assert abs(r_refined - r_float) < 1e-9, (r_refined, r_float)
    exact.unpersist()


def test_filtered_search_and_knn_join_semantics(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    q = emb.where(F.col("vec_id") % 50 == 0)
    got = S.ivf_topk_filtered(q, emb, filter_col="label").collect()
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    assert got, "filtered search returned nothing"
    for r in got:
        assert labels[r["query_id"]] == labels[r["match_id"]]
    # the filter must actually cut candidates vs the unfiltered probe
    unfiltered = S.ivf_topk(
        q.select("vec_id", "embedding"), emb.select("vec_id", "embedding")
    ).collect()
    assert {(r["query_id"], r["match_id"]) for r in got} != {
        (r["query_id"], r["match_id"]) for r in unfiltered
    }

    # knn self-join: every vector appears as a query with <= k rows,
    # and its rows agree with ivf_topk run with that vector as query
    join_rows = S.ivf_knn_join(
        emb.select("vec_id", "embedding"), k=3, nprobe=2
    ).collect()
    per_q = {}
    for r in join_rows:
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["match_id"])
        )
    n_vec = emb.count()
    assert len(per_q) == n_vec
    assert all(len(v) <= 3 for v in per_q.values())
    probe_one = S.ivf_topk(
        emb.where(F.col("vec_id") == 0).select("vec_id", "embedding"),
        emb.select("vec_id", "embedding"),
        k=3,
        nprobe=2,
    ).collect()
    want = sorted((r["rank"], r["match_id"]) for r in probe_one)
    assert sorted(per_q[0]) == want


def test_index_stats_and_append_semantics(spark):
    emb = _emb(spark)
    stats = S.ivf_index_stats(emb).collect()
    n = emb.count()
    assert sum(r["list_size"] for r in stats) == n
    fac = {r["imbalance_factor"] for r in stats}
    assert len(fac) == 1 and fac.pop() >= 1.0  # Cauchy-Schwarz floor

    corpus = emb.where(F.col("vec_id") % 7 != 0)
    batch = emb.where(F.col("vec_id") % 7 == 0)
    out = S.ivf_index_append(corpus, batch).collect()
    assert {r["vec_id"] for r in out} == {
        r["vec_id"] for r in batch.collect()
    }
    # routing agrees with the settled index's own assignment rule
    cents = corpus.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cent_vec"),
    )
    want = {
        r["vid"]: r["centroid_id"]
        for r in S._assign_to_centroids(
            batch, cents, "vec_id", "embedding"
        ).collect()
    }
    assert {r["vec_id"]: r["centroid_id"] for r in out} == want

"""BM25 full-text retrieval over the document corpus.

The training-data counterpart of the reference's name/brand lookup joins
(osm_poi_matchmaker matches POIs by regex/trigram name search —
libs/osm.py timer/query paths): here the corpus is web text and the
lookup is ranked keyword retrieval, the shape used for eval-set
retrieval, quality-classifier seed mining and near-miss auditing of a
100 TB crawl.

Plan shape (the one that survives 1000 executors):

- The corpus is tokenized and exploded ONCE, then immediately
  semi-joined to the broadcast query-term set — Catalyst pushes the
  broadcast hash join below the aggregation, so the full postings list
  for non-query terms is never materialized, never shuffled.
- Corpus-wide statistics (doc count, average doc length) come from one
  map-side partial aggregate over token counts — no explode.
- Per-term document frequencies are computed on the restricted postings
  (tiny: |query terms| rows out) and broadcast back.
- The only wide shuffle is the per-(query, doc) score aggregation, keyed
  on (query_id, doc_id) — skew-free because query terms fan out evenly
  and AQE coalesces the tiny result.

Scoring determinism: a BM25 score is a float sum over matched terms, and
Spark and the DuckDB oracle would otherwise add contributions in
different orders. Contributions are folded IN TERM ORDER on both engines
(array_sort + aggregate here, ``list(c ORDER BY term)`` + list_sum
there), so the doubles are bit-identical before the 6-dp edge rounding,
and the top-k cut orders by the ROUNDED score (+ doc_id tie-break) so
both engines cut the same boundary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import tokens

# Deterministic default query set drawn from the synthetic corpus
# vocabulary (TESTDATA.md documents table) — no external data.
DEFAULT_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "spark join"),
    (2, "fast table scan"),
    (3, "window agg order"),
)


def _query_terms(queries: Sequence[tuple[int, str]]) -> list[tuple[int, str]]:
    """(query_id, term) pairs, distinct per query, order-stable."""
    out: list[tuple[int, str]] = []
    for qid, qtext in queries:
        seen: set[str] = set()
        for t in qtext.split():
            if t and t not in seen:
                seen.add(t)
                out.append((qid, t))
    return out


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]] = DEFAULT_QUERIES,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-k BM25 retrieval: (query_id, doc_id, bm25, rank).

    Okapi BM25 with idf = ln((N - df + 0.5) / (df + 0.5) + 1); distinct
    query terms (unweighted). Docs matching no query term are absent.
    """
    spark = docs.sparkSession
    qt = spark.createDataFrame(_query_terms(queries), "query_id int, term string")

    base = docs.select(F.col(key).alias("doc_id"), tokens(F.col(text)).alias("toks"))
    lens = base.select("doc_id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )

    # Explode → broadcast semi-filter on query terms → tf. Non-query
    # terms die map-side inside the broadcast hash join.
    matched = (
        base.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = matched.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = (
        matched.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            (idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("bm25"), "rank")
    )


def tfidf_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]] = DEFAULT_QUERIES,
    k: int = 5,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-k TF-IDF cosine retrieval: (query_id, doc_id, tfidf_cosine,
    rank). The vector-space twin of :func:`bm25_topk`.

    idf = ln((N + 1) / (df + 1)) + 1 (the smoothed variant, public
    sklearn formula); doc weight = tf * idf; query terms are distinct
    with tf 1 so the query weight IS the idf. Cosine needs the doc norm
    over ALL terms (not just query terms), so unlike BM25 this op pays
    one full postings-shaped aggregation — the same shuffle an index
    build pays, keyed (doc, term) then doc, partial-aggregated map-side.
    Scoring itself stays on the broadcast-semi-filtered postings: only
    query-term rows reach the (query, doc) shuffle.

    Determinism contract (same as bm25_topk): every float sum — doc
    norms, query norms, the dot product — folds IN TERM ORDER on both
    engines, and the top-k cut orders by the 6-dp-rounded score with a
    doc_id tie-break.
    """
    spark = docs.sparkSession
    qt = spark.createDataFrame(_query_terms(queries), "query_id int, term string")

    base = docs.select(F.col(key).alias("doc_id"), tokens(F.col(text)).alias("toks"))
    stats = base.agg(F.count("*").alias("n_docs"))

    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = (
        F.log(
            (F.col("n_docs") + F.lit(1.0))
            / (F.coalesce(F.col("df"), F.lit(0)) + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    weights = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (F.col("tf") * idf).alias("w"))
    )

    def _ordered_fold(value_col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", value_col))),
            F.lit(0.0),
            lambda acc, x: acc + x[value_col],
        )

    norms = weights.select(
        "doc_id", "term", (F.col("w") * F.col("w")).alias("w2")
    ).groupBy("doc_id").agg(F.sqrt(_ordered_fold("w2")).alias("dnorm"))

    qw = (
        qt.join(F.broadcast(dfq), "term", "left")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "term", idf.alias("qw"))
    )
    qnorms = qw.select(
        "query_id", "term", (F.col("qw") * F.col("qw")).alias("w2")
    ).groupBy("query_id").agg(F.sqrt(_ordered_fold("w2")).alias("qnorm"))

    num = (
        weights.join(F.broadcast(qw), "term")
        .select("query_id", "doc_id", "term", (F.col("w") * F.col("qw")).alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(_ordered_fold("c").alias("dotp"))
    )
    scored = (
        num.join(norms, "doc_id")
        .join(F.broadcast(qnorms), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dotp") / (F.col("dnorm") * F.col("qnorm"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("tfidf_cosine"), "rank")
    )

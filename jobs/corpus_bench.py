#!/usr/bin/env python3
"""Corpus-hygiene pipeline scale bench (operators/quality + packing).

The round-2 quality operators are cheap per-row but their scale shapes
differ: repetition_stats is an explode + partial-agg over every token,
boilerplate_ngrams is a global top-k plus a broadcast probe,
pack_sequences is a two-phase exact prefix sum, pii_redact is pure
regex codegen. This job synthesizes a deterministic corpus large enough
that those shapes dominate (default 1M docs, ~60M tokens) and times
each stage to a noop sink (full materialization — count() would let
column pruning skip the actual work).

Corpus construction (all column exprs, no driver data):
- organic doc text = length-varying word sequence from a 30-word vocab,
  token chosen by crc32(id-position) so trigrams are pseudo-random
  (stride-mixed tokens would collapse to ~30 distinct trigrams and the
  top-k would be all organic);
- every 10th doc is the constant cookie-banner phrase plus a 4-token
  organic tail: banner trigrams dominate its shingle set (6 of ~10), so
  the flag at 0.5 must fire on exactly those docs — banner shingle
  document-frequency (n/10) towers over any organic trigram's (~n/300);
- organic doc length cycles 20..119 tokens by id, so packing offsets
  are non-trivial.

Correctness checks are in-run and closed-form (boilerplate flag set ==
the banner docs exactly; total token count vs an exact Python-side
sum) — no oracle run needed at this scale.

Prints ONE JSON line; paste into BENCH.md.

Usage: python3 jobs/corpus_bench.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "order", "data", "column", "join",
    "small", "line", "customer", "query", "big", "window", "stream", "sort",
    "group", "vector", "filter", "the", "a",
]
BANNER = "accept all cookies to continue browsing this site"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.operators.packing import pack_sequences
    from osm_poi_matchmaker_spark.operators.quality import (
        boilerplate_ngrams,
        pii_redact,
        repetition_stats,
    )
    from osm_poi_matchmaker_spark.session import get_spark

    spark = get_spark("corpus-bench", cpus=cpus, shuffle_partitions=cpus * 2)

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    is_banner = F.col("id") % 10 == 0
    doc_len = F.when(is_banner, F.lit(4)).otherwise(
        (F.col("id") % 100 + 20).cast("int")
    )
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), doc_len - 1),
            lambda i: F.element_at(
                vocab,
                (
                    F.crc32(
                        F.concat(
                            F.col("id").cast("string"), F.lit("-"), i.cast("string")
                        )
                    )
                    % 30
                    + 1
                ).cast("int"),
            ),
        ),
    )
    text = F.when(is_banner, F.concat(F.lit(BANNER + " "), body)).otherwise(body)
    docs = (
        spark.range(n_docs, numPartitions=cpus * 2)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .persist()
    )
    n_total = docs.count()  # materialize the corpus before timing

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    from osm_poi_matchmaker_spark.operators.quality import bigram_lm_score
    from osm_poi_matchmaker_spark.operators.retrieval import bm25_topk

    stages = {}
    stages["repetition_stats"] = run("rep", repetition_stats(docs))
    stages["boilerplate_ngrams"] = run("boil", boilerplate_ngrams(docs, top_k=20))
    stages["pack_sequences"] = run("pack", pack_sequences(docs, ctx=2048))
    stages["pii_redact"] = run("pii", pii_redact(docs))
    stages["bigram_lm_score"] = run("lm", bigram_lm_score(docs))
    bm25_queries = [(1, "cookies"), (2, "spark join"), (3, "fast table scan")]
    stages["bm25_topk"] = run("bm25", bm25_topk(docs, bm25_queries))

    # correctness 1: the boilerplate flag recovers EXACTLY the banner
    # docs (banner shingle df is n/10, organic trigram df ~n/300)
    boil = boilerplate_ngrams(docs, top_k=20)
    flag_err = boil.where(
        F.col("is_boilerplate") != (F.col("doc_id") % 10 == 0)
    ).count()
    expected_banner_docs = (n_docs + 9) // 10
    flagged = boil.where(F.col("is_boilerplate")).count()
    # correctness 2: exact total token count vs a Python-side sum
    banner_len = len(BANNER.split()) + 4
    expected_tokens = sum(
        banner_len if i % 10 == 0 else 20 + i % 100 for i in range(n_docs)
    )
    total_tokens = pack_sequences(docs, ctx=2048).agg(
        F.sum("n_tokens")
    ).collect()[0][0]

    # correctness 3: BM25 closed-form — 'cookies' appears exactly once in
    # every banner doc and nowhere else; all banner docs have dl=12, so
    # scores tie and the doc_id tie-break makes top-5 = docs 0..40
    b = bm25_topk(docs, bm25_queries, k=5)
    top_cookies = [
        r["doc_id"]
        for r in b.where(F.col("query_id") == 1).orderBy("rank").collect()
    ]
    bm25_exact = top_cookies == [0, 10, 20, 30, 40]
    # correctness 4: banner docs are built from corpus-frequent bigrams
    # (each banner bigram repeats n/10 times) -> their LM perplexity must
    # sit strictly below the organic mean
    lm = bigram_lm_score(docs).withColumn("banner", F.col("doc_id") % 10 == 0)
    ppl = {
        r["banner"]: r["p"]
        for r in lm.groupBy("banner").agg(F.avg("perplexity").alias("p")).collect()
    }
    lm_ordered = bool(ppl[True] < ppl[False])

    wall = sum(stages.values())
    print(
        json.dumps(
            {
                "metric": "corpus_hygiene_pipeline",
                "value": wall,
                "unit": "sec",
                "stages": stages,
                "docs": n_total,
                "docs_per_sec_pipeline": round(n_total / wall, 1),
                "tokens": int(total_tokens),
                "tokens_expected": int(expected_tokens),
                "tokens_exact": bool(int(total_tokens) == int(expected_tokens)),
                "boiler_flagged": flagged,
                "boiler_expected": expected_banner_docs,
                "boiler_exact": bool(flag_err == 0),
                "bm25_exact": bool(bm25_exact),
                "lm_banner_ppl": round(ppl[True], 3),
                "lm_organic_ppl": round(ppl[False], 3),
                "lm_ordered": lm_ordered,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

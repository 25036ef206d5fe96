#!/usr/bin/env python3
"""ExactSubstr dedup scale bench (operators/dedup.substring_spans /
substring_rewrite).

The substring family's scale shape is one positional window explode
(linear in corpus tokens) + a groupBy on the window key + an equi-join
back — the window KEY WIDTH is the knob that matters at 100 TB (a ~50-byte
8-gram string vs an 8-byte xxhash64 through two shuffles), so this job
times the string-key plan against the hashed-key plan on the same corpus.

Corpus construction (all column exprs, no driver data):
- organic tokens are "t<xxhash64(id-pos)>" — an organic 8-gram repeating
  anywhere in the corpus needs 8 consecutive 64-bit collisions
  (~impossible), so organic windows are unique, giving closed-form
  expectations. NOT crc32: CRC is linear, so a single collision between
  crc32(idA-i) and crc32(idB-i) propagates to EVERY aligned position
  whose index has the same digit length — at 1M docs that manufactured
  ~7k colliding organic token RUNS (measured), silently breaking the
  closed form; xxhash64's avalanche has no such structure;
- every 10th doc is a constant 15-token banner prefix + a 10-token
  organic tail: its k=8 duplicated windows sit at positions 0..7
  (straddling windows contain unique tail tokens), so per banner doc
  n_dup_windows == 8 and lag-clamped coverage == 8 + 7*1 == 15, and
  dup_frac == 15/25 == 0.6 >= 0.5 -> flagged;
- organic doc length cycles 20..119 tokens so the explode is not
  uniform.

In-run correctness (closed form, no oracle at this scale):
- flagged set == banner docs exactly;
- sum(dup_span_tokens) == 15 * n_banner; sum(n_dup_windows) == 8 * n_banner;
- rewrite removes exactly the 15 banner-prefix tokens per banner doc;
- hashed-key plan returns identical aggregate totals.

Prints ONE JSON line; paste into BENCH.md.

Usage: python3 jobs/substring_bench.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANNER = (
    "accept all cookies to continue browsing this site and view fully"
    " personalized content faster today"
)  # 15 tokens


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.operators.dedup import (
        substring_rewrite,
        substring_spans,
    )
    from osm_poi_matchmaker_spark.session import get_spark

    assert len(BANNER.split()) == 15
    spark = get_spark("substring-bench", cpus=cpus, shuffle_partitions=cpus * 2)

    is_banner = F.col("id") % 10 == 0
    tail_len = F.when(is_banner, F.lit(10)).otherwise(
        (F.col("id") % 100 + 20).cast("int")
    )
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), tail_len - 1),
            lambda i: F.concat(
                F.lit("t"),
                F.xxhash64(
                    F.concat(F.col("id").cast("string"), F.lit("-"), i.cast("string"))
                ).cast("string"),
            ),
        ),
    )
    text = F.when(is_banner, F.concat(F.lit(BANNER + " "), body)).otherwise(body)
    docs = (
        spark.range(n_docs, numPartitions=cpus * 2)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .persist()
    )
    n_total = docs.count()
    n_banner = (n_docs + 9) // 10

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    stages = {}
    stages["spans_string_key"] = run(substring_spans(docs, k=8))
    stages["spans_hashed_key"] = run(substring_spans(docs, k=8, hashed=True))
    stages["rewrite"] = run(substring_rewrite(docs, k=8))

    # closed-form checks (one extra evaluation, untimed)
    sp = substring_spans(docs, k=8).persist()
    agg = sp.agg(
        F.sum(F.col("is_substring_dup").cast("long")).alias("flagged"),
        F.sum("dup_span_tokens").alias("covered"),
        F.sum("n_dup_windows").alias("wins"),
    ).collect()[0]
    flag_err = sp.where(
        F.col("is_substring_dup") != (F.col("doc_id") % 10 == 0)
    ).count()
    sp.unpersist()
    hashed_agg = substring_spans(docs, k=8, hashed=True).agg(
        F.sum(F.col("is_substring_dup").cast("long")),
        F.sum("dup_span_tokens"),
        F.sum("n_dup_windows"),
    ).collect()[0]
    removed = substring_rewrite(docs, k=8).agg(F.sum("n_removed")).collect()[0][0]

    wall = sum(stages.values())
    print(
        json.dumps(
            {
                "metric": "substring_dedup_bench",
                "value": wall,
                "unit": "sec",
                "stages": stages,
                "docs": n_total,
                "docs_per_sec_spans": round(n_total / stages["spans_string_key"], 1),
                "hashed_speedup": round(
                    stages["spans_string_key"] / stages["spans_hashed_key"], 3
                ),
                "flagged_exact": bool(
                    flag_err == 0 and int(agg["flagged"]) == n_banner
                ),
                "coverage_exact": bool(int(agg["covered"]) == 15 * n_banner),
                "windows_exact": bool(int(agg["wins"]) == 8 * n_banner),
                "rewrite_exact": bool(int(removed) == 15 * n_banner),
                "hashed_identical": bool(
                    tuple(map(int, hashed_agg)) == tuple(map(int, agg))
                ),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

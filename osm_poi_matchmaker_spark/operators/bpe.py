"""Distributed BPE vocabulary induction (Sennrich et al., ACL'16).

A training-data pipeline that ships corpora also ships the tokenizer
learned from them; at 100 TB the pair-counting passes are the corpus
job, not a notebook step. The standard efficiency trick carries over
unchanged: merges operate on the DISTINCT-WORD vocabulary weighted by
word counts — one corpus scan builds (word, count), and every BPE round
after that touches only the vocabulary table (10^5-10^7 rows regardless
of corpus size).

- **Pair counting** is one explode + partial-agg groupBy per round over
  the vocab (adjacent symbol pairs via slice+zip, weighted by count;
  overlapping occurrences count fully, as in the reference algorithm).
- **The argmax pair** is one tiny driver action per round (count DESC,
  then lexicographic (left,right) — deterministic), the same O(rounds)
  driver pattern as connected_components.
- **Merge application** is a pure column-expression fold over each
  word's symbol array — left-to-right non-overlapping greedy, exactly
  re.sub semantics without regex: the accumulator appends, or replaces
  its last element with the merged token when (last, current) == (L, R).
  A merged token never re-merges within the round (L+R == L would need
  R == ''). ``localCheckpoint`` per round keeps the plan from nesting
  k folds deep.
- **Tokenization** (:func:`apply_bpe`) tokenizes each DISTINCT word
  once (vocab-side pandas UDF over Arrow batches — the per-word merge
  loop is inherently sequential), then broadcast-joins words back to
  documents: corpus cost is the join, not the Python.

Iterative → no SQL oracle; correctness is pinned exactly against an
independent pure-Python Sennrich implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"


def word_vocab(docs: DataFrame, text: str = "text") -> DataFrame:
    """(word, cnt, syms) — lowercased whitespace words; syms = chars
    plus the end-of-word sentinel symbol."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text)), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.concat(
                F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
                F.array(F.lit(END)),
            ),
        )
    )


def _adjacent_pairs(syms_col):
    n = F.size(syms_col)
    return F.arrays_zip(
        F.slice(syms_col, 1, n - 1).alias("left"),
        F.slice(syms_col, 2, n - 1).alias("right"),
    )


def _merge_fold(syms_col, left: str, right: str):
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame, n_merges: int, text: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, vocab_df): merges as [(left, right, pair_count)]
    in rank order, and the final symbolized vocabulary (word, cnt,
    syms) for inspection. Stops early if no pair remains.
    """
    vocab = word_vocab(docs, text).select("cnt", "syms").localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            vocab.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.left").alias("l"), F.col("p.right").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((l, r, n))
        vocab = vocab.select(
            "cnt", _merge_fold(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(merges)],
        T.StructType(
            [
                T.StructField("rank", T.IntegerType(), False),
                T.StructField("left", T.StringType(), False),
                T.StructField("right", T.StringType(), False),
                T.StructField("merged", T.StringType(), False),
                T.StructField("pair_count", T.LongType(), False),
            ]
        ),
    )


def tokenize_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference-exact greedy application of merges in rank order."""
    syms = list(word) + [END]
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list.

    Each DISTINCT word is tokenized once (Arrow-batched pandas UDF —
    the per-word merge loop is sequential by nature), then words
    broadcast-join back onto the exploded corpus and re-assemble per
    doc. Returns (key, tokens array<string>, n_tokens). Docs whose text
    tokenizes to zero words (empty/whitespace-only) emit a row with an
    empty tokens array and n_tokens=0 — matching the pinned oracle,
    which pins a row for EVERY doc (ADVICE r4).
    """
    pairs = [(l, r) for l, r, *_ in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tok(words: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in words:
            yield s.map(lambda w: tokenize_word(w, pairs))

    vocab = (
        docs.select(F.explode(F.split(F.lower(F.col(text)), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
        .withColumn("wtoks", tok(F.col("word")))
    )
    exploded = docs.select(
        F.col(key),
        F.posexplode(F.split(F.lower(F.col(text)), r"\s+")).alias("pos", "word"),
    ).where(F.col("word") != "")
    tokenized = (
        exploded.join(F.broadcast(vocab), "word")
        .groupBy(key)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wtoks"))),
                    lambda s: s.wtoks,
                )
            ).alias("tokens")
        )
    )
    # Left-join back onto the full doc set so zero-word docs keep a row.
    return (
        docs.select(key)
        .join(tokenized, key, "left")
        .select(
            key,
            F.coalesce(
                F.col("tokens"), F.array().cast(T.ArrayType(T.StringType()))
            ).alias("tokens"),
        )
        .select(key, "tokens", F.size("tokens").alias("n_tokens"))
    )

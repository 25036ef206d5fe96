"""Sequence packing for training-data assembly.

GPT-style pretraining concatenates the token stream and cuts it every
``ctx`` tokens ("concat-then-chunk"), so each document maps to a global
token offset and a span of context-window bins. That mapping is a pure
function of an exact global prefix sum over a deterministic document
order — which is where naive Spark goes wrong: ``Window.orderBy(...)``
with no partition funnels the whole corpus through ONE task.

:func:`pack_sequences` computes the prefix sum two-phase instead (the
same shape as ``plans/export.global_row_number``): bucket by aligned
ranges of the numeric key (order-preserving shift), aggregate per-bucket
token sums map-side, window over the tiny bucket list for each bucket's
starting offset, broadcast back, and run the in-bucket cumulative sum
one task per bucket. Output is identical to the single-window form
(tested) and the plan scales with bucket count.

The reference has no training-data layer; this is pipeline-side new
work (token accounting reuses functions/textstats.token_count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count


def pack_sequences(
    docs: DataFrame,
    ctx: int = 512,
    key: str = "doc_id",
    text: str = "text",
    bucket_shift: int = 8,
) -> DataFrame:
    """Map each doc to its global token offset and context-window span.

    Returns (key, n_tokens, global_offset, bin_first, bin_last,
    bin_offset, n_bins_spanned). Bin ids use exact integer division
    (``div``), never double division — offsets past 2^53 tokens would
    silently round under a float path. An empty doc occupies (and only
    touches) the bin its offset falls in.
    """
    d = docs.select(F.col(key), token_count(F.col(text)).alias("n_tokens"))
    b = d.withColumn("_gb", F.shiftright(F.col(key), bucket_shift))
    sums = b.groupBy("_gb").agg(F.sum("n_tokens").alias("_s"))
    # bucket rows only — thousands, not billions; the literal partition
    # key declares the bound (not the unbounded partitionless antipattern)
    w_off = Window.partitionBy(F.lit(0)).orderBy("_gb")
    offsets = sums.withColumn("_off", F.sum("_s").over(w_off) - F.col("_s")).drop(
        "_s"
    )
    w_in = Window.partitionBy("_gb").orderBy(key)
    out = (
        b.join(F.broadcast(offsets), "_gb")
        .withColumn(
            "global_offset",
            (F.col("_off") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")).cast(
                "long"
            ),
        )
        .drop("_gb", "_off")
    )
    n = F.col("n_tokens")
    off = F.col("global_offset")
    bin_first = F.expr(f"global_offset div {ctx}")
    bin_last = F.when(
        n > 0, F.expr(f"(global_offset + n_tokens - 1) div {ctx}")
    ).otherwise(bin_first)
    return out.select(
        key,
        "n_tokens",
        "global_offset",
        bin_first.alias("bin_first"),
        bin_last.alias("bin_last"),
        (off % ctx).alias("bin_offset"),
        (bin_last - bin_first + 1).alias("n_bins_spanned"),
    )


def chunk_documents(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    ctx: int = 2048,
    stride: int | None = None,
) -> DataFrame:
    """Per-document sliding-window chunking (the document-boundary-
    preserving counterpart of ``pack_sequences``' concat-then-chunk):
    windows of ``ctx`` tokens every ``stride`` tokens (stride < ctx =
    overlapping context, the long-document training recipe).

    Start count is the standard recipe ``1 + ceil(max(0, n - ctx) /
    stride)`` — the last chunk reaches the document end (shorter than
    ctx only when the remainder is), and no chunk is ever fully
    contained in its predecessor. Pure array expressions — one sequence
    + transform + posexplode, no shuffle at all (chunking is
    embarrassingly row-local; provenance (doc_id, chunk_idx, start_tok)
    rides along for lineage).
    """
    from ..functions.textstats import tokens

    if stride is None:
        stride = ctx
    t = docs.select(F.col(key), tokens(F.col(text)).alias("toks"))
    n = F.size("toks")
    # exact integer ceil on non-negative ints (doubles exact < 2^53)
    n_starts = F.when(
        n > 0,
        F.lit(1)
        + (
            (F.greatest(n - F.lit(ctx), F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("long"),
    ).otherwise(F.lit(0))
    chunks = F.when(
        n_starts > 0,
        F.transform(
            F.sequence(F.lit(0), n_starts.cast("int") - 1),
            lambda i: F.struct(
                (i * stride).alias("start_tok"),
                F.concat_ws(
                    " ", F.slice(F.col("toks"), i * stride + 1, ctx)
                ).alias("chunk_text"),
                F.least(n - i * stride, F.lit(ctx)).alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<start_tok:int,chunk_text:string,n_tokens:int>>"
    ))
    return t.select(F.col(key), F.posexplode(chunks).alias("chunk_idx", "c")).select(
        key,
        "chunk_idx",
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )

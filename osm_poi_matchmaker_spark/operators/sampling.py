"""Deterministic sampling / split assignment for training-data curation.

Beyond the reference (which has no sampling), but first-class for a
100 TB training-data pipeline: train/val/test assignment and per-group
downsampling must be (a) deterministic — re-runs and resumed jobs must
agree row-for-row, (b) key-based, not row-order-based — Spark partition
order is not stable across cluster sizes, and (c) pure column
arithmetic — no Python, no RNG state, no shuffle (a narrow projection).

``rand(seed)`` fails (b): its value depends on partition layout.
``df.sample``/``sampleBy`` fail (a) across differing partitioning.
Instead every row gets a bucket in [0, buckets) from a Lehmer/MINSTD
hash of its stable key, and splits/samples are bucket ranges: the same
key lands in the same split on 8 executors or 8000, today and in next
month's incremental run. MINSTD (multiplier 48271, modulus 2^31-1,
Park-Miller) is chosen over a Knuth 2^32-multiplier because the product
stays below 2^63 for keys up to ~1.9e14 — covering 10^12 document ids
with NO integer overflow, so the arithmetic is bit-identical in plain
BIGINT across Spark (ANSI mode included) and any SQL oracle; engine
hash functions (xxhash64/murmur) are avoided because they differ across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MINSTD = 48271
_M31 = (1 << 31) - 1  # Mersenne prime 2^31-1

# the same arithmetic as ANSI SQL, for oracles and cross-engine checks
BUCKET_SQL = "(({key} * 48271) % 2147483647) % {buckets}"


def hash_bucket(key: Column, buckets: int = 1000) -> Column:
    """Stable bucket in [0, buckets) from a non-negative integer key
    (valid for keys < 2^63/48271 ≈ 1.9e14 — overflow-free)."""
    return ((key.cast("long") * _MINSTD) % _M31) % buckets


def assign_split(
    df: DataFrame,
    key: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    buckets: int = 1000,
) -> DataFrame:
    """Add a ``split`` column: train / val / test by bucket range.

    Fractions are exact at 1/buckets granularity; the remainder after
    train+val is test.
    """
    b = hash_bucket(F.col(key), buckets)
    t_hi = int(round(train * buckets))
    v_hi = t_hi + int(round(val * buckets))
    split = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group: str = "lang",
    key: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 1000,
) -> DataFrame:
    """Per-group deterministic downsample: keep a row iff its bucket is
    below ``rate(group) * buckets``. The per-group threshold folds into
    a literal CASE (few groups) or joins as a broadcast dim — either
    way the sample is a narrow filter, no shuffle, and adding a group
    later never changes which already-kept rows are kept (bucket
    assignment is independent of the rate)."""
    b = hash_bucket(F.col(key), buckets)
    expr = F.lit(int(round(default_rate * buckets)))
    for g, r in sorted(rates.items()):
        expr = F.when(F.col(group) == g, int(round(r * buckets))).otherwise(expr)
    return df.where(b < expr)


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    key: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    buckets: int = 1000,
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: every member of a
    near-dup component inherits the split of its CANONICAL id, so two
    near-duplicate documents can never straddle train and test (the
    eval-leakage failure mode a plain per-doc split has — ~half of each
    near-dup pair's mass lands across the boundary).

    ``components`` is the (key, canonical_id) verdict from
    :func:`~..operators.dedup.dedup_components` (or keep-best); the
    bucket arithmetic is the same overflow-free MINSTD hash as
    :func:`assign_split`, applied to canonical_id. Split membership is
    therefore key-based and resume/cluster-size stable, and changing
    the LSH recall only moves docs whose component changed.
    """
    b = hash_bucket(F.col("canonical_id"), buckets)
    t_hi = int(round(train * buckets))
    v_hi = t_hi + int(round(val * buckets))
    split = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(key).join(
        components.select(key, "canonical_id"), key
    ).select(key, "canonical_id", split.alias("split"))


def corpus_release(
    docs: DataFrame,
    gate: DataFrame,
    keep_best: DataFrame,
    key: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    buckets: int = 1000,
) -> DataFrame:
    """End-to-end release disposition — the verdict column a corpus build
    stamps on every document before writing shards:

    - ``gate:<reason>``  quality-gated out (:func:`~..operators.quality.corpus_gate`);
    - ``duplicate``      survived the gate but lost keep-best dedup
      (:func:`~..operators.dedup.dedup_keep_best`);
    - ``train``/``val``/``test``  survivors, split by the MINSTD bucket
      of their keep-best CANONICAL id — so near-dup families that
      somehow both survive can never straddle the eval boundary, and
      the verdict is stable across cluster sizes and resumes.

    Gate and dedup verdicts are computed corpus-wide (not gated-first):
    idempotent, order-free, and each sub-verdict remains independently
    auditable. One plan, three key-joins — no new shuffles beyond the
    component ops' own.
    """
    b = hash_bucket(F.col("canonical_id"), buckets)
    t_hi = int(round(train * buckets))
    v_hi = t_hi + int(round(val * buckets))
    split = (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    disposition = (
        F.when(F.col("reason") != "keep", F.concat(F.lit("gate:"), F.col("reason")))
        .when(F.col("is_duplicate"), F.lit("duplicate"))
        .otherwise(split)
    )
    return (
        docs.select(F.col(key).alias("doc_id"))
        .join(gate.select("doc_id", "reason"), "doc_id")
        .join(keep_best.select(key, "canonical_id", "is_duplicate"), "doc_id")
        .select("doc_id", disposition.alias("disposition"))
    )


def quality_weighted_sample(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    group: str = "source",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Domain reweighting, the deterministic static form (DoReMi-style
    domain weights without the proxy-model loop): each group's (source
    domain's) keep-rate IS its mean quality — domains full of
    boilerplate or gibberish shrink in the training mix, clean domains
    pass through intact.

    The mean is exact integer arithmetic end-to-end: per-doc quality is
    the 0..3 indicator sum behind ``textstats.quality_score`` (length ok
    + stopword-rate ok + punctuation ok), so
    ``rate_ppm = (SUM(ok3) * 1_000_000) div (3 * COUNT(*))`` is
    associative and bit-identical on any engine and any partitioning —
    a double mean would be sum-order-dependent and could flip a
    keep/drop at a bucket boundary. Keep iff
    ``minstd_bucket(key, 1e6) < rate_ppm``: re-runs, resumes and
    cluster-size changes keep exactly the same rows, and a group's rate
    only moves when its quality profile does.

    One tiny per-group agg broadcast back onto a narrow filter — the
    doc table crosses no shuffle. Returns (key, group, rate_ppm, kept).
    """
    from ..functions.textstats import punct_ratio, stopword_ratio, token_count

    t = F.col(text)
    n = token_count(t)
    sw = stopword_ratio(t)
    pr = punct_ratio(t)
    ok3 = (
        ((n >= 10) & (n <= 5000)).cast("int")
        + ((sw >= 0.01) & (sw <= 0.6)).cast("int")
        + (pr <= 0.2).cast("int")
    )
    rates = (
        docs.select(F.col(group), ok3.alias("ok3"))
        .groupBy(group)
        .agg(
            F.expr(f"(sum(ok3) * {buckets}) div (3 * count(1))").alias("rate_ppm")
        )
    )
    b = hash_bucket(F.col(key), buckets)
    return (
        docs.select(F.col(key), F.col(group))
        .join(F.broadcast(rates), group)
        .select(
            F.col(key),
            F.col(group),
            "rate_ppm",
            (b < F.col("rate_ppm")).alias("kept"),
        )
    )

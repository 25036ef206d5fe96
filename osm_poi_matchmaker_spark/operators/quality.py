"""Corpus-quality operators for the training-data pipeline.

Three filters every web-scale corpus build needs before training:

- :func:`repetition_stats` — Gopher-style repetition signals per doc
  (duplicate-token fraction, most-frequent-token fraction, duplicate
  2-gram fraction) and a composite ``is_repetitive`` flag.
- :func:`boilerplate_ngrams` — corpus-LEVEL boilerplate detection: the
  globally most document-frequent word n-grams (nav bars, cookie
  banners, footers repeat verbatim across a crawl) and each doc's
  fraction of shingles drawn from that set.
- :func:`pii_redact` — email/phone masking with per-doc redaction
  counts.

Reference analogue: the reference's text hygiene is per-record and
row-at-a-time (``libs/address.py`` clean_* family; the duplicate guards
in ``dao/data_handlers.py:220-312``); these generalize it to the
corpus-level quality passes the reference never needed at its scale.

Scale notes (100 TB): everything here is either a pure array expression
(whole-stage codegen, zero Python) or an explode + partially-aggregated
``groupBy`` (map-side combine), so the wide tables never shuffle more
than once; the boilerplate top-k is TakeOrderedAndProject (per-partition
top-k, driver merges k rows per partition — no global sort) and the
resulting k-row dim is broadcast back, so the corpus side of that join
never moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .dedup import shingles

# Shared with the DuckDB oracle (oracles_docs.py) — keep the two regex
# dialects' common subset: no lookaround, no backrefs, explicit classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{2} \d{2} \d{3} \d{4}"


def _raw_shingles(toks: Column, n: int) -> Column:
    """Overlapping word n-grams WITHOUT dedup (duplicate counts are the
    point here, unlike ``dedup.shingles``), empty-safe."""
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.when(
        n_sh > 0,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    top_token_max: float = 0.10,
    dup_2gram_max: float = 0.30,
) -> DataFrame:
    """Per-doc repetition signals (Gopher-rule flavored, arithmetic only
    so the oracle reproduces it exactly).

    The token histogram runs explode + groupBy (partial-agg shape — at
    planet scale this beats a per-row O(n_tokens × n_distinct) array
    scan for long documents); the n-gram duplicate fraction stays a pure
    array expression.
    """
    base = docs.select(F.col(key), tokens(F.lower(F.col(text))).alias("toks"))
    sh2 = _raw_shingles(F.col("toks"), 2)
    row = base.select(
        key,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(sh2).alias("n2"),
        F.size(F.array_distinct(sh2)).alias("nd2"),
    )
    hist = (
        base.select(key, F.explode("toks").alias("tok"))
        .groupBy(key, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(key)
        .agg(F.max("c").alias("top_c"))
    )
    n = F.col("n_tokens").cast("double")
    dup_tok = F.when(
        F.col("n_tokens") > 0, (F.col("n_tokens") - F.col("n_distinct")) / n
    ).otherwise(F.lit(0.0))
    top_tok = F.when(
        F.col("n_tokens") > 0, F.coalesce(F.col("top_c"), F.lit(0)) / n
    ).otherwise(F.lit(0.0))
    dup2 = F.when(
        F.col("n2") > 0,
        (F.col("n2") - F.col("nd2")) / F.col("n2").cast("double"),
    ).otherwise(F.lit(0.0))
    return row.join(hist, key, "left").select(
        key,
        "n_tokens",
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(top_tok, 6).alias("top_token_frac"),
        F.round(dup2, 6).alias("dup_2gram_frac"),
        ((top_tok > top_token_max) | (dup2 > dup_2gram_max)).alias("is_repetitive"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    top_k: int = 20,
    flag_frac: float = 0.5,
) -> DataFrame:
    """Flag documents dominated by the corpus's most document-frequent
    word ``n``-grams (two-pass: global top-k, then a broadcast probe).

    Determinism: top-k ties break on the shingle string ascending, so
    the cut set is identical across engines and partitionings.
    """
    e = docs.select(
        F.col(key), F.explode(shingles(F.col(text), n)).alias("shingle")
    )
    topk = (
        e.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(top_k)
    )
    # one probe pass computes BOTH per-doc totals: shingle count and
    # top-k hits (a left broadcast join + single groupBy). The shingle
    # arrays are materialized exactly twice corpus-wide (top-k build,
    # probe) — the minimum for an exact two-pass top-k; zero-shingle
    # docs drop out of the explode and re-enter via the key-only join.
    per = (
        e.join(
            F.broadcast(topk.select("shingle", F.lit(1).alias("_hit"))),
            "shingle",
            "left",
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("nsh"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("nb"),
        )
    )
    n_sh = F.coalesce(F.col("nsh"), F.lit(0))
    n_boiler = F.coalesce(F.col("nb"), F.lit(0))
    frac = F.when(n_sh > 0, n_boiler / n_sh.cast("double")).otherwise(F.lit(0.0))
    return (
        docs.select(key)
        .join(per, key, "left")
        .select(
            key,
            n_sh.cast("int").alias("n_shingles"),
            n_boiler.alias("n_boiler"),
            F.round(frac, 6).alias("boiler_frac"),
            (frac >= flag_frac).alias("is_boilerplate"),
        )
    )


def pii_redact(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Mask emails and phone numbers, returning the redacted text plus
    per-doc counts. The synthetic corpus is PII-free, so a deterministic
    contact blurb derived from the key is appended first (on both
    engines identically) — the redaction pass is exercised non-vacuously
    and the oracle checks byte equality of the masked output.
    """
    aug = F.concat(
        F.col(text),
        F.lit(" Contact: user"),
        F.col(key).cast("string"),
        F.lit("@example.com or call +36 30 555 "),
        F.lpad((F.col(key) % 10000).cast("string"), 4, "0"),
        F.lit("."),
        F.when((F.col(key) % 3) == 0, F.lit(" cc admin@example.org")).otherwise(
            F.lit("")
        ),
    )
    red = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.select(
        F.col(key),
        F.regexp_count(aug, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(PHONE_RE)).alias("n_phones"),
        red.alias("redacted"),
    )


def bigram_lm_score(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """CCNet-style LM quality scoring: train an add-one-smoothed bigram
    LM on the corpus itself, score every doc by mean token log-prob and
    perplexity. Low-probability docs (gibberish, OCR noise, wrong-language
    spillover) sit in the high-perplexity tail — the standard cut for a
    crawl quality filter when no external LM is allowed.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V); per-doc score is the mean
    over its bigrams. Docs with < 2 tokens have no bigrams and are absent.

    Scale shape: bigram/unigram counting is explode + map-side partial
    agg; the two count joins shuffle on (w1, w2) / w1 — the canonical
    LM-training shape, AQE handles stop-word skew; the 1-row vocab size
    broadcasts. Determinism: per-doc log-probs are folded in position
    order on both engines, so the double sum is bit-identical before the
    6-dp edge rounding.
    """
    base = docs.select(F.col(key).alias("doc_id"), tokens(F.col(text)).alias("toks"))
    n_bi = F.greatest(F.size("toks") - F.lit(1), F.lit(0))
    empty = F.array().cast("array<struct<pos:int,w1:string,w2:string>>")
    bg = base.select(
        "doc_id",
        F.explode(
            F.when(
                n_bi > 0,
                F.transform(
                    F.sequence(F.lit(1), n_bi),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.element_at("toks", i).alias("w1"),
                        F.element_at("toks", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(empty)
        ).alias("b"),
    ).select("doc_id", "b.pos", "b.w1", "b.w2")

    uni = (
        base.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    bic = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    logp = F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v")))
    scored = (
        bg.join(bic, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "pos", logp.alias("logp"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("pos", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["logp"],
        ).alias("s"),
    )
    avg = F.col("s") / F.col("n_bigrams")
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(avg, 6).alias("avg_logp"),
        F.round(F.exp(-avg), 6).alias("perplexity"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 100, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Tokenizer-vocab induction: the corpus's top-``k`` terms by total
    frequency, with document frequency alongside — the first pass of any
    BPE/WordPiece vocab build and the frequency table behind stopword
    and boilerplate lists.

    Scale shape: explode + map-side partial agg, then TakeOrderedAndProject
    (per-partition top-k, driver merges k rows per partition — no global
    sort). Ties break on the term ascending so the cut is identical
    across engines and partitionings; rank is a window over the k
    surviving rows only.
    """
    uni = (
        docs.select(F.col(key).alias("_k"), F.explode(tokens(F.col(text))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("_k").alias("df"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(k)
    )
    # the window input is ≤ k rows by construction (limit above); the
    # literal partition key declares that bound — this is NOT the
    # unbounded partitionless-window antipattern WindowExec warns about
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("freq"), F.asc("term"))
    return uni.withColumn("rank", F.row_number().over(w).cast("long"))


def corpus_gate(
    docs: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    min_tokens: int = 15,
    max_perplexity: float = 31.0,
) -> DataFrame:
    """The composite keep/drop verdict a corpus build actually applies:
    every document gets a ``keep`` flag and the FIRST failing rule as
    ``reason`` (fixed rule order, so the verdict is deterministic):

    1. ``too_short``       — fewer than ``min_tokens`` whitespace tokens;
    2. ``repetitive``      — :func:`repetition_stats` composite flag
       (Gopher-style dup-token / top-token / dup-2-gram cuts);
    3. ``high_perplexity`` — corpus bigram-LM perplexity above
       ``max_perplexity`` (:func:`bigram_lm_score`); docs too short to
       have bigrams were already caught by rule 1;
    4. otherwise ``keep``.

    Composes three already-verified passes with two joins on the doc
    key; the threshold compares use the 6-dp-ROUNDED perplexity both
    engines emit identically. Scale shape: inherits the component ops'
    shapes — nothing here adds a shuffle beyond the key joins.
    """
    toks_n = docs.select(
        F.col(key).alias("doc_id"), F.size(tokens(F.col(text))).alias("_nt")
    )
    rep = repetition_stats(docs, key=key, text=text).select(
        F.col(key).alias("doc_id"), "is_repetitive"
    )
    lm = bigram_lm_score(docs, key=key, text=text).select("doc_id", "perplexity")
    j = toks_n.join(rep, "doc_id").join(lm, "doc_id", "left")
    reason = (
        F.when(F.col("_nt") < min_tokens, F.lit("too_short"))
        .when(F.col("is_repetitive"), F.lit("repetitive"))
        .when(
            F.col("perplexity").isNotNull()
            & (F.col("perplexity") > F.lit(max_perplexity)),
            F.lit("high_perplexity"),
        )
        .otherwise(F.lit("keep"))
    )
    return j.select(
        "doc_id", reason.alias("reason"), (reason == "keep").alias("keep")
    )

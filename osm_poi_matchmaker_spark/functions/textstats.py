"""Text-analysis column functions for the training-data pipeline.

All JVM-side built-ins (split / regexp / aggregate expressions) — no Python
in the hot path. These generalize the reference's per-record text hygiene
(``libs/address.py`` clean_* family) to corpus-level quality signals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram language heuristic. Real deployments
# plug in fastText-style models via mapInPandas; the heuristic keeps the
# pipeline dependency-free and deterministic.
STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")
STOPWORDS_HU = ("a", "az", "és", "hogy", "nem", "egy", "van", "meg", "de", "el")


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string safe)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
# letter/digit/punctuation runs, residual whitespace. Both Java regex
# (Spark) and RE2 (DuckDB oracle) read this dialect identically.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish regex token count (training-data token accounting): the
    number of pre-tokenizer matches, a stable proxy for BPE token cost
    without shipping a vocabulary."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs with low
    punctuation noise and a plausible stopword rate (Gopher-rule flavored,
    arithmetic only so the oracle can reproduce it)."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    pr = punct_ratio(text)
    pr_ok = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + sw_ok + pr_ok) / F.lit(3.0)


def lang_guess(text: Column) -> Column:
    """Stopword-vote language ID (en vs hu vs unknown)."""
    toks = tokens(F.lower(text))
    en = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    hu = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_HU)))
    return (
        F.when((en == 0) & (hu == 0), F.lit("und"))
        .when(en >= hu, F.lit("en"))
        .otherwise(F.lit("hu"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the token stream — the
    whitespace-insensitive analogue of the reference's poi_hash
    (data_handlers.py:881-885: sha512 over lowercased, space-stripped
    address key)."""
    return F.md5(F.concat_ws(" ", tokens(F.lower(text))))


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash over the lowercased
    token stream: fold ``h = (h*1000003 + v(tok)) mod 2^31-1`` with a
    cheap per-token value (first/last char codes + length). Unlike the
    md5 fingerprint this composes incrementally — the streaming/chunked
    ingest path can extend it without re-reading the document. Pure
    ``transform``/``aggregate`` column expressions, no Python."""
    toks = tokens(F.lower(text))
    vals = F.transform(
        toks,
        lambda t: (
            F.ascii(t) * 131 + F.length(t) * 7 + F.ascii(F.substring(t, -1, 1))
        ).cast("long"),
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 1000003 + v) % 2147483647,
    )


def doc_stats(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    t = F.col(text)
    return docs.select(
        F.col(key),
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        char_count(t).alias("n_chars_measured"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        doc_fingerprint(t).alias("fingerprint"),
    )

"""URL canonicalization + per-domain rollups for the crawl pipeline.

A web-scale corpus keys almost everything on the URL (dedup, refetch
policy, per-domain quotas), so canonicalization must be deterministic
and cheap: everything here is pure column expressions (whole-stage
codegen, zero Python). Spark's ``parse_url`` would be the idiomatic
extractor, but the DuckDB oracle has no twin for it — the splits below
stay inside the regex/string common subset of both engines and are
pinned byte-exact by the ``url_normalize`` oracle query.

Normalization rules (the usual crawl-frontier canon):
- scheme and host lowercased;
- default ports dropped (``http:80``, ``https:443``), others kept;
- fragment stripped;
- empty path → ``/``; trailing slashes trimmed (except the root);
- tracking params (``utm_*``) dropped, the rest sorted byte-wise.

The reference has no URL layer (its feeds are fixed endpoints,
``dataproviders/*.py`` link constants); this is pipeline-side new work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_normalize(u: Column) -> Column:
    """Canonical form of an absolute ``scheme://host[:port]/path?query``
    URL (see module docstring for the rules)."""
    nofrag = F.substring_index(u, "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    # substring_index returns the WHOLE string when the separator is
    # absent, so the query must be guarded (DuckDB's split_part yields
    # '' unguarded — the CASE keeps the twins aligned).
    query = F.when(
        nofrag.contains("?"), F.substring_index(nofrag, "?", -1)
    ).otherwise(F.lit(""))
    scheme = F.lower(F.substring_index(base, "://", 1))
    rest = F.substring_index(base, "://", -1)
    hostport = F.substring_index(rest, "/", 1)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_out = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    trimmed = F.regexp_replace(path, r"/+$", "")
    path_out = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~kv.startswith("utm_"),
        )
    )
    qs = F.concat_ws("&", params)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_out,
        path_out,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_host(u: Column) -> Column:
    """Lowercased host of an absolute URL (port stripped)."""
    rest = F.substring_index(F.substring_index(u, "://", -1), "/", 1)
    return F.lower(F.substring_index(rest, ":", 1))


def registered_domain(host: Column) -> Column:
    """Last two labels of the host — the registrable-domain approximation
    (a real deployment plugs in the public-suffix list; two labels keep
    the op dependency-free and oracle-reproducible)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def domain_stats(pages: DataFrame, url: str = "url", text: str = "text") -> DataFrame:
    """Per-host crawl rollup: page count, distinct canonical URLs, and
    mean text length — the shape behind per-domain quotas and frontier
    prioritization. One partial-aggregated groupBy on the host; no
    joins, the wide table shuffles once on an already-tiny projection.
    """
    canon = url_normalize(F.col(url))
    host = url_host(F.col(url))
    return (
        pages.select(
            host.alias("host"),
            registered_domain(host).alias("domain"),
            canon.alias("canon_url"),
            F.length(F.col(text)).alias("text_len"),
        )
        .groupBy("host", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canon_url").alias("n_urls"),
            F.round(F.avg("text_len"), 6).alias("avg_text_len"),
        )
    )


def url_template(u: Column) -> Column:
    """Digit-collapsed path template of an absolute URL: fragment and
    query stripped, every decimal-digit run in the path replaced by
    ``{n}`` — the crawl-side "same template, different entity" key
    behind frontier dedup, per-template quotas and boilerplate
    discovery (all /product-{n}.html pages share one layout)."""
    nofrag = F.substring_index(u, "#", 1)
    noq = F.substring_index(nofrag, "?", 1)
    rest = F.substring_index(noq, "://", -1)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.regexp_replace(path, r"[0-9]+", "{n}")


def template_stats(pages: DataFrame, url: str = "url") -> DataFrame:
    """Per-(host, template) page counts — one partial-agg groupBy on a
    two-column projection (template cardinality is the number of page
    LAYOUTS a site ships, orders of magnitude below its URL count, so
    the aggregate output is tiny at any crawl scale)."""
    return (
        pages.select(
            url_host(F.col(url)).alias("host"),
            url_template(F.col(url)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def domain_quantiles(pages: DataFrame, url: str = "url", text: str = "text") -> DataFrame:
    """Per-host EXACT text-length quantiles (p50/p90/p99) — the
    distribution read-off behind per-domain length filters (a mean hides
    the boilerplate spike; the tail quantiles are what length gates cut
    on). ``percentile`` is the exact sort-based aggregate with linear
    interpolation — identical definition to DuckDB's ``quantile_cont``,
    so the oracle hashes the doubles directly. One partial-agg groupBy
    on a two-column projection; for 100 TB sketches swap in
    ``percentile_approx`` (same plan shape, bounded state)."""
    host = url_host(F.col(url))
    q = F.expr("percentile(text_len, array(0.5, 0.9, 0.99))")
    return (
        pages.select(host.alias("host"), F.length(F.col(text)).alias("text_len"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            q.alias("_q"),
        )
        .select(
            "host",
            "n_pages",
            F.round(F.element_at("_q", 1), 6).alias("p50_len"),
            F.round(F.element_at("_q", 2), 6).alias("p90_len"),
            F.round(F.element_at("_q", 3), 6).alias("p99_len"),
        )
    )

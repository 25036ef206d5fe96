"""Crawl-frontier scheduling: per-host politeness slots and quotas.

A 10^12-page crawl cannot fetch a host faster than its crawl-delay; the
frontier therefore needs, per host, a deterministic fetch ORDER and the
wall-clock offset each URL is allowed to start at. The reference
fetches one provider feed at a time (no frontier at all); this is the
distributed analogue.

Scale shape: ONE window partitioned by host — the only shuffle, keyed
on the natural parallelism unit of a crawl. No global ordering, no
driver loop. Per-host partitions are bounded by the quota cut, and host
count (~10^8 on the web) dwarfs executor count, so the window
parallelizes; a mega-host (quota-capped anyway) is one partition's
worth of row_number, which is O(quota). Crawl-delays ship as a literal
map (robots.txt-derived dims are small) — no join for the common case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frontier_schedule(
    frontier: DataFrame,
    host_delays_ms: dict[str, int] | None = None,
    default_delay_ms: int = 1000,
    quota: int | None = None,
) -> DataFrame:
    """Assign each (url, host, priority) row its per-host fetch slot.

    Slots go to higher priority first (ties broken by url so the order
    is total); ``scheduled_ms = slot * delay(host)`` with per-host
    overrides from ``host_delays_ms``. Rows at or past ``quota`` are
    dropped — the frontier trim that keeps mega-hosts from starving the
    fetch pool. All integer arithmetic.
    """
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    slot = (F.row_number().over(w) - 1).cast("long").alias("slot")
    out = frontier.select("url", "host", "priority", slot)
    if quota is not None:
        out = out.where(F.col("slot") < quota)
    if host_delays_ms:
        pairs = [x for kv in sorted(host_delays_ms.items()) for x in kv]
        delay = F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(v) for v in pairs]), F.col("host")
            ),
            F.lit(default_delay_ms),
        )
    else:
        delay = F.lit(default_delay_ms)
    return out.select(
        "url",
        "host",
        "priority",
        "slot",
        (F.col("slot").cast("long") * delay.cast("long")).alias("scheduled_ms"),
    )


def robots_filter(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """RFC 9309 path filtering: the LONGEST matching prefix rule decides
    (allow wins length ties — encoded as max over the (length, allow)
    struct, where true > false). URLs on hosts with no matching rule
    pass.

    ``frontier``: (url, host, path); ``rules``: (host, prefix, allow).
    Robots dims are small even web-wide (rules per host are bounded by
    robots.txt size), so the rule side broadcasts and the whole plan is
    one broadcast left join + ONE partial-agg groupBy(url) — non-matching
    rules become a null struct that max() ignores, so there is no
    join-back and hosts without rules fall through to allowed.

    Two rules of equal length both matching the same path ARE the same
    string (equal-length prefixes of one string), so (length, allow) is
    a total tie-break; the prefix rides along only to be reported.
    """
    hit = F.when(
        F.col("prefix").isNotNull()
        & F.col("path").startswith(F.col("prefix")),
        F.struct(
            F.length("prefix").alias("l"),
            F.col("allow").alias("a"),
            F.col("prefix").alias("p"),
        ),
    )
    return (
        frontier.join(F.broadcast(rules), "host", "left")
        .groupBy("url", "host", "path")
        .agg(F.max(hit).alias("best"))
        .select(
            "url",
            "host",
            "path",
            F.coalesce(F.col("best.a"), F.lit(True)).alias("allowed"),
            F.col("best.p").alias("rule_prefix"),
        )
    )

"""functions/urls unit tests: canonicalization edge cases the oracle
fixture doesn't reach (non-default ports, all-utm queries, multi-slash
paths, registered-domain extraction, domain_stats rollup)."""

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.functions.urls import (
    domain_stats,
    registered_domain,
    url_host,
    url_normalize,
)


def _norm(spark, raw):
    df = spark.createDataFrame([(raw,)], "u string")
    return df.select(url_normalize(F.col("u")).alias("c")).collect()[0]["c"]


def test_normalize_cases(spark):
    cases = {
        # scheme/host case, default https port, fragment
        "HTTPS://Host.Example:443/A/b#x": "https://host.example/A/b",
        # http default port dropped; non-default kept
        "http://h.example:80/p": "http://h.example/p",
        "http://h.example:8080/p": "http://h.example:8080/p",
        # https on port 80 is NOT default -> kept
        "https://h.example:80/p": "https://h.example:80/p",
        # empty path -> '/', multi trailing slashes trimmed to root
        "https://h.example": "https://h.example/",
        "https://h.example///": "https://h.example/",
        # params sorted, utm_* dropped, all-utm query vanishes entirely
        "https://h.example/p?z=1&a=2": "https://h.example/p?a=2&z=1",
        "https://h.example/p?utm_a=1&utm_b=2": "https://h.example/p",
        # path case preserved (only scheme/host lowercase)
        "https://H.example/CaseKept": "https://h.example/CaseKept",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw


def test_host_and_registered_domain(spark):
    df = spark.createDataFrame([("https://a.B.site.example:8443/x?q=1",)], "u string")
    row = df.select(
        url_host(F.col("u")).alias("h"),
        registered_domain(url_host(F.col("u"))).alias("d"),
    ).collect()[0]
    assert row["h"] == "a.b.site.example"
    assert row["d"] == "site.example"


def test_domain_stats_rollup(spark):
    rows = [
        ("https://a.example/1", "xx"),
        ("https://A.example/1#frag", "yyyy"),  # same canon URL as above
        ("https://a.example/2", "zz"),
        ("https://b.example/1", "wwwwww"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["host"]: r for r in domain_stats(df).collect()}
    assert got["a.example"]["n_pages"] == 3
    assert got["a.example"]["n_urls"] == 2  # fragment collapses into /1
    assert got["a.example"]["avg_text_len"] == round((2 + 4 + 2) / 3, 6)
    assert got["b.example"]["n_pages"] == 1
    assert got["a.example"]["domain"] == "a.example"


def test_url_template_collapses_digit_runs(spark):
    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.functions.urls import template_stats, url_template

    rows = [
        (1, "https://Shop.Example:443/product-17.html?a=1#frag"),
        (2, "https://shop.example/product-9999.html"),
        (3, "https://shop.example/store/5/details"),
        (4, "https://shop.example"),
    ]
    df = spark.createDataFrame(rows, ["i", "url"])
    t = {r["i"]: r["t"] for r in df.select("i", url_template(F.col("url")).alias("t")).collect()}
    assert t[1] == "/product-{n}.html"  # query + fragment stripped
    assert t[2] == "/product-{n}.html"  # 1 and 2 share a template
    assert t[3] == "/store/{n}/details"
    assert t[4] == "/"  # bare host -> root template

    stats = {
        (r["host"], r["template"]): r["n_pages"]
        for r in template_stats(df).collect()
    }
    assert stats[("shop.example", "/product-{n}.html")] == 2
    assert stats[("shop.example", "/store/{n}/details")] == 1

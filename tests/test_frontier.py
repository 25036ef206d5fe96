"""frontier_schedule: slot order, quota trim, per-host delay map."""

from osm_poi_matchmaker_spark.operators.frontier import frontier_schedule


def _frontier(spark):
    rows = [
        ("https://a.example/1", "a.example", 10),
        ("https://a.example/2", "a.example", 30),
        ("https://a.example/3", "a.example", 30),
        ("https://b.example/1", "b.example", 5),
        ("https://b.example/2", "b.example", 7),
    ]
    return spark.createDataFrame(rows, "url string, host string, priority int")


def test_slots_priority_then_url(spark):
    out = {
        r["url"]: r for r in frontier_schedule(_frontier(spark)).collect()
    }
    # a.example: both 30s first (url tiebreak /2 before /3), then the 10
    assert out["https://a.example/2"]["slot"] == 0
    assert out["https://a.example/3"]["slot"] == 1
    assert out["https://a.example/1"]["slot"] == 2
    # independent per-host numbering
    assert out["https://b.example/2"]["slot"] == 0
    assert out["https://b.example/1"]["slot"] == 1
    # default delay 1000
    assert out["https://a.example/1"]["scheduled_ms"] == 2000


def test_quota_and_delay_map(spark):
    out = frontier_schedule(
        _frontier(spark),
        host_delays_ms={"a.example": 250},
        default_delay_ms=1000,
        quota=2,
    ).collect()
    by_url = {r["url"]: r for r in out}
    assert len(out) == 4  # slot 2 trimmed on a.example
    assert "https://a.example/1" not in by_url
    assert by_url["https://a.example/3"]["scheduled_ms"] == 250
    assert by_url["https://b.example/1"]["scheduled_ms"] == 1000


def test_robots_longest_match_semantics(spark):
    from osm_poi_matchmaker_spark.operators.frontier import robots_filter

    fr = spark.createDataFrame(
        [
            ("u1", "a.example", "/private/x"),
            ("u2", "a.example", "/private/pub/x"),
            ("u3", "a.example", "/open/x"),
            ("u4", "norules.example", "/anything"),
        ],
        "url string, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("a.example", "/private/", False),
            ("a.example", "/private/pub/", True),
        ],
        "host string, prefix string, allow boolean",
    )
    out = {r["url"]: r for r in robots_filter(fr, rules).collect()}
    assert not out["u1"]["allowed"] and out["u1"]["rule_prefix"] == "/private/"
    # the longer allow overrides the shorter disallow (RFC 9309)
    assert out["u2"]["allowed"] and out["u2"]["rule_prefix"] == "/private/pub/"
    # no matching rule on the host, and no rules at all -> allowed
    assert out["u3"]["allowed"] and out["u3"]["rule_prefix"] is None
    assert out["u4"]["allowed"] and out["u4"]["rule_prefix"] is None


def test_robots_rules_broadcast(spark):
    import contextlib
    import io

    from osm_poi_matchmaker_spark.operators.frontier import robots_filter

    fr = spark.createDataFrame(
        [("u1", "a.example", "/x")], "url string, host string, path string"
    )
    rules = spark.createDataFrame(
        [("a.example", "/", False)], "host string, prefix string, allow boolean"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        robots_filter(fr, rules).explain(mode="simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan

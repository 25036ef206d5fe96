"""operators/delta unit tests: all four statuses on a hand fixture, and
the plan pruning check (the join moves key+hash, not the text column)."""

from osm_poi_matchmaker_spark.operators.delta import crawl_delta, delta_rollup


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_crawl_delta_statuses(spark):
    old = _snap(spark, [("u1", "same"), ("u2", "old text"), ("u3", "bye")])
    new = _snap(spark, [("u1", "same"), ("u2", "new text"), ("u4", "hello")])
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }


def test_delta_rollup_counts(spark):
    old = _snap(spark, [("a", "1"), ("b", "2")])
    new = _snap(spark, [("b", "2"), ("c", "3"), ("d", "4")])
    counts = {
        r["status"]: r["n"] for r in delta_rollup(crawl_delta(old, new)).collect()
    }
    assert counts == {"added": 2, "removed": 1, "unchanged": 1}


def test_delta_prunes_text_before_join(spark):
    old = _snap(spark, [("a", "x")])
    new = _snap(spark, [("a", "x")])
    plan = crawl_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    # the hash projection must happen below the join: no 'text' column
    # appears in the join's output attributes
    join_part = plan[plan.index("SortMergeJoin") :] if "SortMergeJoin" in plan else plan
    assert "old_hash" in plan and "new_hash" in plan
    assert "text" not in join_part.split("\n")[0]

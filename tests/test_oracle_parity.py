"""The local correctness gate: every ``queries()`` entry must match its
DuckDB oracle at sf0.001, exactly the way the driver compares at sf0.01
(row count + column names + order-insensitive canonical values)."""

from __future__ import annotations

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")

from tests.conftest import SF_SMALL, assert_frames_match  # noqa: E402

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    spark_pd = q(spark, SF_SMALL).toPandas()
    assert len(spark_pd) > 0, f"{name}: Spark result is empty"
    if name not in oracles:
        pytest.skip(f"{name}: no oracle (rows-only check)")
    duck_pd = duck.execute(oracles[name]).df()
    assert_frames_match(spark_pd, duck_pd, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert "page_id" in df.columns

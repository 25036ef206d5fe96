"""Plan hygiene for the provider layer: every provider_* entry in the
driver contract must compile to a physical plan with no cartesian
product, and the two join-shaped providers (jysk detail join, pepco
admin-city semi-join) must take the broadcast strategy they declare.

Feed-order windows (fire_station, kulcs_patika, nemzetidohanybolt,
mobil_petrol, mobiliti's single-group scan) intentionally run on one
partition — feeds are dimension-sized — so a single-partition Exchange
is allowed; a CartesianProduct never is."""

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")

_entry = importlib.import_module("__spark_entry__")

_PROVIDERS = sorted(
    name for name in _entry.queries() if name.startswith("provider_")
)


@pytest.mark.parametrize("name", _PROVIDERS)
def test_provider_plan_has_no_cartesian_product(spark, name):
    df = _entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_join_shaped_providers_broadcast(spark):
    q = _entry.queries()
    jysk = q["provider_jysk"](spark, "/root/testdata/sf0.001")
    plan = jysk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # detail pages join
    pepco = q["provider_pepco"](spark, "/root/testdata/sf0.001")
    plan = pepco._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # admin-city left_semi

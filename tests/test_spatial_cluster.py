"""DBSCAN closed-form tests beyond the oracle: role assignment (core /
border / noise), deterministic cluster ids, cell-boundary pair recall,
and plan hygiene (the ε self-join must be an equi-join, never a
cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.spatial_cluster import (
    dbscan_clusters,
    distance_band_pairs,
)

# 1 degree of latitude ≈ 111194.9 m on the R=6371000 sphere.
DEG_300M = 300.0 / 111194.9267


def _points(spark, rows):
    return spark.createDataFrame(rows, ["osm_id", "lat", "lon"])


def test_chain_roles_and_noise(spark):
    # a(1) - b(2) - c(3) spaced 300 m apart on a meridian; eps=400,
    # min_pts=3: only b has |N(b)|=3 → core; a and c are border onto
    # b's singleton cluster (id = min core id = 2); d is noise.
    pts = _points(
        spark,
        [
            (1, 47.0, 19.0),
            (2, 47.0 + DEG_300M, 19.0),
            (3, 47.0 + 2 * DEG_300M, 19.0),
            (4, 48.0, 20.0),
        ],
    )
    out = {r["osm_id"]: (r["role"], r["cluster"]) for r in
           dbscan_clusters(pts, eps_m=400.0, min_pts=3).collect()}
    assert out == {1: ("border", 2), 2: ("core", 2), 3: ("border", 2),
                   4: ("noise", None)}


def test_two_blobs_merge_through_core_chain(spark):
    # two 3-point blobs bridged by a core-core edge chain share one
    # cluster with id = global min core id.
    base = [(i, 47.0 + i * DEG_300M, 19.0) for i in range(1, 8)]
    pts = _points(spark, base)
    out = dbscan_clusters(pts, eps_m=400.0, min_pts=3).collect()
    clusters = {r["cluster"] for r in out}
    # interior points 2..6 are core (each sees both neighbours); the
    # whole chain is one component labelled by the min core id (2).
    assert clusters == {2}
    roles = {r["osm_id"]: r["role"] for r in out}
    assert roles[1] == "border" and roles[7] == "border"
    assert all(roles[i] == "core" for i in range(2, 7))


def test_min_pts_one_isolated_points_are_singleton_cores(spark):
    pts = _points(spark, [(10, 47.0, 19.0), (20, 48.0, 20.0)])
    out = {r["osm_id"]: (r["role"], r["cluster"]) for r in
           dbscan_clusters(pts, eps_m=400.0, min_pts=1).collect()}
    assert out == {10: ("core", 10), 20: ("core", 20)}


def test_pairs_found_across_cell_boundary(spark):
    # mult=128 cell pitch is 1/128°; straddle a lat cell edge with a
    # 300 m pair (well under eps) — the 3×3 ring must recover it.
    edge = (47.0 * 128 + 64) / 128.0  # an exact cell boundary latitude
    pts = _points(
        spark,
        [(1, edge - DEG_300M / 2, 19.0), (2, edge + DEG_300M / 2, 19.0)],
    )
    pairs = distance_band_pairs(pts, eps_m=400.0).collect()
    assert len(pairs) == 1 and pairs[0]["a"] == 1 and pairs[0]["b"] == 2
    assert abs(pairs[0]["distance"] - 300.0) < 1.0


def test_pair_join_is_equi_join_no_cartesian(spark):
    pts = _points(spark, [(1, 47.0, 19.0), (2, 47.0 + DEG_300M, 19.0)])
    plan = distance_band_pairs(pts, eps_m=400.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def _cluster_sets(rows):
    """Role map + clusters as frozensets (id-scheme-independent compare)."""
    roles = {r["osm_id"]: r["role"] for r in rows}
    clusters = {}
    for r in rows:
        if r["cluster"] is not None:
            clusters.setdefault(r["cluster"], set()).add(r["osm_id"])
    return roles, {frozenset(v) for v in clusters.values()}, {
        r["osm_id"]: r["cluster"] for r in rows}


def test_contracted_equals_naive_on_fixtures(spark):
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        dbscan_clusters_contracted,
    )

    pts = _points(
        spark,
        [(i, 47.0 + i * DEG_300M, 19.0) for i in range(1, 8)]
        + [(100, 47.5, 19.5), (101, 47.5 + DEG_300M / 3, 19.5),
           (102, 47.5 + 2 * DEG_300M / 3, 19.5), (103, 47.5 + DEG_300M, 19.5),
           (200, 48.9, 20.9)],
    )
    for mp in (1, 2, 3, 4):
        naive = dbscan_clusters(pts, eps_m=400.0, min_pts=mp).collect()
        fast = dbscan_clusters_contracted(pts, eps_m=400.0, min_pts=mp).collect()
        assert _cluster_sets(naive) == _cluster_sets(fast), f"min_pts={mp}"


def test_contracted_equals_naive_on_synth(spark):
    from osm_poi_matchmaker_spark import synth
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        dbscan_clusters_contracted,
    )

    pois = synth.osm_pois(spark, "/root/testdata/sf0.001")
    naive = dbscan_clusters(pois, eps_m=400.0, min_pts=3).collect()
    fast = dbscan_clusters_contracted(pois, eps_m=400.0, min_pts=3).collect()
    assert _cluster_sets(naive) == _cluster_sets(fast)


def test_fine_mult_diagonal_under_eps():
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        _DIAG_M_PER_DEG,
        fine_mult_for_eps,
    )

    for eps in (100.0, 250.0, 400.0, 1000.0):
        mult = fine_mult_for_eps(eps)
        assert _DIAG_M_PER_DEG / mult < eps
        assert _DIAG_M_PER_DEG / (mult // 2) >= eps


def test_assign_probe_roles(spark):
    from osm_poi_matchmaker_spark.operators.spatial_cluster import (
        dbscan_assign_probe,
    )

    settled_pts = _points(
        spark,
        [(1, 47.0, 19.0), (2, 47.0 + DEG_300M, 19.0),
         (3, 47.0 + 2 * DEG_300M, 19.0)],
    )
    settled = dbscan_clusters(settled_pts, eps_m=400.0, min_pts=3).join(
        settled_pts.select("osm_id", "lat", "lon"), "osm_id"
    )
    batch = _points(
        spark,
        [
            (100, 47.0 + DEG_300M, 19.0 + DEG_300M / 111194.9267 * 75925.0 * 0),  # 0 m east of core 2 → same spot
            (101, 47.0 + 4 * DEG_300M, 19.0),   # 600 m past core 2's reach → near border 3 only → unassigned
            (102, 48.5, 20.5),                  # nowhere → unassigned
        ],
    )
    out = {r["osm_id"]: (r["status"], r["cluster"]) for r in
           dbscan_assign_probe(batch, settled, eps_m=400.0).collect()}
    # only core 2 counts: 100 sits on it → assigned to cluster 2;
    # 101 is within ε of POINT 3 but 3 is border, not core → unassigned.
    assert out == {100: ("assigned", 2), 101: ("unassigned", None),
                   102: ("unassigned", None)}


def test_polyline_length_degenerate_and_basic(spark):
    from osm_poi_matchmaker_spark.geo import polyline_length_m

    lat_of = lambda nid: 47.0 + (nid % 10).cast("double") * 0.0011  # noqa: E731
    lon_of = lambda nid: (19.0 + (nid * 0).cast("double"))  # noqa: E731
    df = spark.createDataFrame(
        [(1, [10, 11, 12]), (2, [20]), (3, [])],
        "way_id long, nodes array<bigint>",
    )
    got = {
        r["way_id"]: r["L"]
        for r in df.select(
            "way_id",
            F.round(polyline_length_m(F.col("nodes"), lat_of, lon_of), 1).alias("L"),
        ).collect()
    }
    # two 0.0011-deg meridian steps ≈ 2 × 122.3 m; <2 nodes → 0.0 (the
    # sequence(1,0) guard — Spark would otherwise DESCEND, not be empty)
    assert abs(got[1] - 244.6) < 1.0
    assert got[2] == 0.0 and got[3] == 0.0

"""hotspot_cells: ring accounting, factor predicate, peak flag, edges."""

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.tiling import X_SPAN, hotspot_cells


def _cells(spark, counted):
    """counted: {(x, y): n} -> one row per point with cell_id."""
    rows = [
        (y * X_SPAN + x,)
        for (x, y), n in counted.items()
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "cell_id long")


def test_hotspot_ring_math_and_peak(spark):
    # a 10-point peak at (5,5) ringed by three 1-point cells, plus a
    # flat 4/4 pair far away (neither beats 2x the other)
    grid = {
        (5, 5): 10,
        (4, 5): 1,
        (6, 6): 1,
        (5, 4): 1,
        (100, 100): 4,
        (101, 100): 4,
    }
    out = {
        r["cell_id"]: r
        for r in hotspot_cells(_cells(spark, grid), factor=(2, 1)).collect()
    }
    peak = out[5 * X_SPAN + 5]
    assert peak["n_points"] == 10
    assert peak["ring_sum"] == 3
    assert peak["n_neighbors"] == 3
    assert peak["is_peak"]
    # 10*8 > 2*3 holds; the 4/4 pair fails 4*8 > 2*4? 32 > 8 holds!
    # each 4-cell has ring_sum 4 => 32 > 8 qualifies, and is_peak False
    flat = out[100 * X_SPAN + 100]
    assert flat["ring_sum"] == 4 and not flat["is_peak"]
    # ringed singletons are filtered by min_count
    assert (4 * 1 + 5 * X_SPAN) not in out


def test_hotspot_factor_and_min_count(spark):
    grid = {(5, 5): 6, (6, 5): 3}
    # 6*8 > 2*3 -> hot at factor 2; at factor (17,1): 48 > 51 fails
    hot2 = hotspot_cells(_cells(spark, grid), factor=(2, 1)).collect()
    assert {r["cell_id"] for r in hot2} == {
        5 * X_SPAN + 5,
        5 * X_SPAN + 6,
    }
    hot17 = hotspot_cells(_cells(spark, grid), factor=(17, 1)).collect()
    # 6: 48 > 17*3=51 false; 3: 3*8=24 > 17*6=102 false
    assert hot17 == []


def test_hotspot_grid_edge_no_wrap(spark):
    # x=0 cell: the dx=-1 neighbors would wrap into the previous row
    # without the bounds guard; (X_SPAN-1, y) must not absorb its mass
    grid = {(0, 5): 5, (X_SPAN - 1, 4): 9, (X_SPAN - 1, 5): 9}
    out = {
        r["cell_id"]: r
        for r in hotspot_cells(_cells(spark, grid), factor=(2, 1)).collect()
    }
    left = out[5 * X_SPAN + 0]
    assert left["ring_sum"] == 0 and left["n_neighbors"] == 0
    assert left["is_peak"]

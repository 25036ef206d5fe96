from pyspark.sql import functions as F
from osm_poi_matchmaker_spark.tiling import X_SPAN, kde_smooth

def test_single_point_kernel(spark):
    c = 100 * X_SPAN + 100
    pts = spark.createDataFrame([(c,)], ["cell_id"])
    out = {r["cell_id"]: (r["n_points"], r["kde_mass_256"]) for r in kde_smooth(pts).collect()}
    assert len(out) == 25
    assert out[c] == (1, 36)            # 6*6
    assert out[c + 1] == (0, 24)        # 6*4
    assert out[c + 2 + X_SPAN] == (0, 4)  # 4*1
    assert sum(m for _, m in out.values()) == 256

def test_two_points_sum_and_edge_guard(spark):
    c = 100 * X_SPAN  # x=0: dx<0 clipped
    pts = spark.createDataFrame([(c,), (c,), (c + 1,)], ["cell_id"])
    out = {r["cell_id"]: (r["n_points"], r["kde_mass_256"]) for r in kde_smooth(pts).collect()}
    assert out[c] == (2, 2 * 36 + 1 * 24)
    assert all(k % X_SPAN <= 3 for k in out)          # nothing wrapped to the row end
    total = sum(m for _, m in out.values())
    clipped = 2 * sum(1 * w for w in (1, 4, 6, 4, 1)) * 2  # two columns lost for the x=0 pair
    assert total == 3 * 256 - 2 * (16 + 64) - 1 * 16   # x=0 loses cols -2,-1; x=1 loses col -2

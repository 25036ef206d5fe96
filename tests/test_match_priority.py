"""Hand-built match-priority fixtures: the cascade's ordering semantics
(first non-empty stage wins; within a stage ORDER BY priority, distance;
deterministic osm_id tie-break) asserted case by case against
``dao/poi_base.py:720-786`` behavior — the statistical oracle in
test_oracle_parity can pass even if an individual tie-break is wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.match import match_cascade, match_pages

LAT, LON = 47.5, 19.04
M = 1.0 / 111194.0  # degrees latitude per meter


def case_lon(case: int) -> float:
    """Each case gets its own base point ~3.7 km apart — candidates must
    not bleed across cases through the radius tiers."""
    return LON + case * 0.05


_PAGES_SCHEMA = (
    "page_id long, name string, lat double, lon double, city string,"
    " street string, housenumber string, csn string, ref string, uname string"
)
_POIS_SCHEMA = (
    "osm_id long, node_type string, name string, shop string, amenity string,"
    " railway string, addr_city string, addr_street string,"
    " addr_housenumber string, addr_conscriptionnumber string,"
    " addr_postcode string, ref_value string, lat double, lon double"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, _PAGES_SCHEMA)


def _pois(spark, rows):
    return spark.createDataFrame(rows, _POIS_SCHEMA)


def poi(osm_id, case, name, dist_m, shop=None, amenity=None, railway=None,
        city=None, street=None, hn=None, ref=None):
    return (osm_id, "node", name, shop, amenity, railway, city, street, hn,
            None, None, ref, LAT + dist_m * M, case_lon(case))


@pytest.fixture(scope="module")
def result(spark):
    pages = _pages(spark, [
        # p1: ref + unique-name + nearby candidates -> stage 1 (ref) wins
        #     even though the unique-name POI is 20x closer
        (1, "MAV allomas", LAT, case_lon(1), None, None, None, None, "MAV7", "Hall 1"),
        # p2: unique-name (100 m, beyond d_safe) vs full-address stage-4
        #     match at 400 m -> stage 2 wins
        (2, "Spar", LAT, case_lon(2), "Pest", "Fo utca", "12", None, None, "Hall 2"),
        # p3: two name-only tier-980 hits -> nearer wins
        (3, "Spar", LAT, case_lon(3), None, None, None, None, None, None),
        # p4: street+hn tier-950 at 200 m vs name-only tier-980 at 8 m
        #     -> the higher tier wins despite being 25x farther
        (4, "Spar", LAT, case_lon(4), None, "Kis utca", "3", None, None, None),
        # p5: only candidate is the avoid-name trap 2 m away -> NO match
        (5, "OTP Bank", LAT, case_lon(5), None, None, None, None, None, None),
        # p6: two POIs at the exact page point (distance 0, same tier)
        #     -> lower osm_id breaks the tie
        (6, "Spar", LAT, case_lon(6), None, None, None, None, None, None),
    ])
    pois = _pois(spark, [
        poi(101, 1, "MAV allomas", 200.0, railway="station", ref="MAV7"),
        poi(102, 1, "Hall 1", 10.0, railway="station"),
        poi(201, 2, "Hall 2", 100.0, shop="convenience"),
        poi(202, 2, "Spar", 400.0, shop="supermarket",
            city="Pest", street="Fo utca", hn="12"),
        poi(301, 3, "Spar", 30.0, shop="convenience"),
        poi(302, 3, "Spar", 10.0, shop="convenience"),
        poi(401, 4, "Spar", 200.0, shop="convenience", street="Kis utca", hn="3"),
        poi(402, 4, "Spar", 8.0, shop="convenience"),
        # avoid-name trap: PASSES the bank tag predicate, 2 m away — only
        # the avoid-name regex (tier 990's !~* clause) can reject it
        poi(501, 5, "OTP Travel", 2.0, amenity="bank"),
        poi(602, 6, "Spar", 0.0, shop="convenience"),
        poi(601, 6, "Spar", 0.0, shop="convenience"),
    ])
    best = match_cascade(pages, pois, synth.poi_common_df(spark),
                         brand_rows=synth.BRAND_ROWS)
    return {r["page_id"]: r for r in best.collect()}


def test_ref_tier_beats_unique_name(result):
    assert result[1]["osm_id"] == 101
    assert result[1]["stage"] == 1 and result[1]["priority"] == 930


def test_unique_name_beats_full_address(result):
    assert result[2]["osm_id"] == 201
    assert result[2]["stage"] == 2 and result[2]["priority"] == 930


def test_same_tier_nearer_wins(result):
    assert result[3]["osm_id"] == 302
    assert result[3]["priority"] == 980


def test_higher_tier_beats_nearer(result):
    assert result[4]["osm_id"] == 401
    assert result[4]["priority"] == 950


def test_avoid_name_blocks_match(result):
    assert 5 not in result  # match_cascade emits matched pages only


def test_distance_tie_breaks_on_osm_id(result):
    assert result[6]["osm_id"] == 601
    assert result[6]["distance"] == pytest.approx(0.0, abs=1e-6)


def test_match_pages_flags_new(spark, result):
    pages = _pages(spark, [
        (5, "OTP Bank", LAT, case_lon(5), None, None, None, None, None, None),
    ]).withColumn("url", F.lit("u")).withColumn(
        "cell_id", F.lit(0).cast("long"))
    pois = _pois(spark, [poi(501, 5, "OTP Travel", 2.0, amenity="bank")])
    out = match_pages(pages, pois, synth.poi_common_df(spark),
                      brand_rows=synth.BRAND_ROWS).collect()
    assert len(out) == 1 and out[0]["poi_new"] is True


def test_shuffle_path_identical_winners(spark):
    """The planet-scale degradation (broadcast_candidates=False → shuffle
    equi-joins, candidate-side ring explode) must pick exactly the same
    winners as the broadcast plan — only the physical strategy changes."""
    import __spark_entry__ as entry_mod
    from osm_poi_matchmaker_spark.extract.geotag import geotag_pages

    sf = "/root/testdata/sf0.001"
    pg = geotag_pages(synth.pages(spark, sf))
    pois = synth.osm_pois(spark, sf)
    common = synth.poi_common_df(spark)
    a = match_cascade(pg, pois, common, brand_rows=synth.BRAND_ROWS).collect()
    b = match_cascade(
        pg, pois, common, brand_rows=synth.BRAND_ROWS, broadcast_candidates=False
    ).collect()
    key = lambda r: r["page_id"]
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(map(tuple, b), key=lambda t: t[0])
    assert len(a) > 0


def test_shuffle_path_plan_shape(spark):
    """With the hint dropped the arms must become shuffle joins (no
    candidate broadcast) and every ring explode must sit candidate-side."""
    import contextlib, io
    from osm_poi_matchmaker_spark.extract.geotag import geotag_pages

    sf = "/root/testdata/sf0.001"
    # At sf0.001 the optimizer auto-broadcasts the tiny candidate side even
    # without the hint (correctly). Planet-scale candidate stats exceed the
    # threshold, so simulate that by disabling auto-broadcast — the hint-free
    # plan must then be shuffle-joined, which is the property under test.
    thresholds = ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k in thresholds:
            spark.conf.set(k, "-1")
        pg = geotag_pages(synth.pages(spark, sf))
        df = match_cascade(
            pg, synth.osm_pois(spark, sf), synth.poi_common_df(spark),
            brand_rows=synth.BRAND_ROWS, broadcast_candidates=False,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # ring explodes are the explode(transform([...offsets...])) generators;
    # the brand-eligibility explodes (cand_pc) are candidate-side by
    # construction and not what this asserts
    ring_lines = [l for l in plan.splitlines() if "explode(transform(" in l]
    assert ring_lines, "expected ring explodes in the plan"
    assert all("cand_cell" in l for l in ring_lines), ring_lines
    assert not any("probe_cell" in l for l in ring_lines), ring_lines


def test_bounded_name_arms_identical_winners(spark):
    """name_arm_radius_m is a planet-scale relaxation: with a radius that
    covers every true match distance, winners must be identical to the
    unbounded plan, on BOTH physical paths; the bound columns must not
    leak into the output."""
    from osm_poi_matchmaker_spark.extract.geotag import geotag_pages

    sf = "/root/testdata/sf0.001"
    pg = geotag_pages(synth.pages(spark, sf))
    pois = synth.osm_pois(spark, sf)
    common = synth.poi_common_df(spark)
    base = match_cascade(pg, pois, common, brand_rows=synth.BRAND_ROWS)
    rows = base.collect()
    want = sorted(map(tuple, rows))
    assert want
    # radius must cover every true attribute-arm match distance (the
    # synthetic domain has legitimate ~95 km unique-name matches)
    radius = 1.5 * max(
        r["distance"] for r in rows if r["stage"] in (2, 3, 4)
    )
    for bc in (True, False):
        got_df = match_cascade(
            pg, pois, common, brand_rows=synth.BRAND_ROWS,
            broadcast_candidates=bc, name_arm_radius_m=radius,
        )
        assert got_df.columns == base.columns
        assert sorted(map(tuple, got_df.collect())) == want, f"broadcast={bc}"


def test_bounded_name_arms_exclude_far_same_name(spark):
    """A same-named candidate beyond the radius must NOT win under the
    bound (it would under reference semantics) — the relaxation is real,
    not a no-op."""
    from osm_poi_matchmaker_spark.extract.geotag import geotag_pages
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    pg = geotag_pages(synth.pages(spark, sf))
    pois = synth.osm_pois(spark, sf)
    common = synth.poi_common_df(spark)
    # move every candidate ~2.2 degrees north (~250 km): attribute keys
    # still match, distances blow past a 50 km bound
    far = pois.withColumn("lat", F.col("lat") + F.lit(2.2))
    unbounded = match_cascade(pg, far, common, brand_rows=synth.BRAND_ROWS)
    # reference semantics: s2/s3/s4 still match on attributes alone
    s234 = unbounded.where(F.col("stage").isin(2, 3, 4)).count()
    assert s234 > 0
    bounded = match_cascade(
        pg, far, common, brand_rows=synth.BRAND_ROWS, name_arm_radius_m=50_000.0
    )
    assert bounded.where(F.col("stage").isin(2, 3, 4)).count() == 0

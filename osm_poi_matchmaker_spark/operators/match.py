"""The match cascade — the reference's core operator, Spark-first.

Reference behavior (``dao/poi_base.py:149-793``): for EACH harvested POI it
runs up to 5 staged SQL queries against PostGIS, in descending specificity;
the first stage returning rows wins, and within a stage candidates are
ranked ``ORDER BY priority ASC, distance ASC`` and the top row taken
(``poi_base.py:742-744, 779-783``). One SQL round-trip per POI per stage —
the anti-pattern this engine exists to remove.

Spark rebuild: ALL pages are matched in one plan —

  stage 1 (prio 930): additional-ref equality        (``poi_base.py:251-279``)
  stage 3 (prio 965): name ~ rx ∧ csn = ∧ city =     (``poi_base.py:376-406``)
  stage 4 (prio 940): name ∧ city ∧ street ∧ hn      (``poi_base.py:444-475``)
  stage 5: the radius query, 5 arms in one join      (``poi_base.py:519-719``)
      prio 950: name ∧ street ∧ hn,  dist < d_perfect
      prio 970: name ∧ street,       dist < d_safe
      prio 970: name ∧ hn,           dist < d_safe
      prio 980: name,                dist < d_safe
      prio 990: ¬avoid-name,         dist < d_unsafe

(stage 2 — the unique-name tier, ``poi_base.py:312-338`` — activates only
for brands with a unique-name regex; none in the synthetic dimension yet.)

Stages 1/3/4 are distance-free attribute joins → plain shuffle equi-joins
on composite keys. Stage 5 is a radius join → a coarse-cell 3×3 ring join
(9× fixed fan-out, see tiling.py) with the haversine + tier predicates
evaluated post-join as codegen'd column expressions. A single window
(partition by page, order by stage → priority → distance → osm_id) then
reproduces "first non-empty stage wins, best (priority, distance) within
stage" exactly — with osm_id as the deterministic tie-break the reference
leaves to incidental row order.

Scale notes (100 TB): pages≫pois, so the ring join shuffles pages 9× on the
coarse cell — the same key the candidate table is bucketed by, so the POI
side needs no re-shuffle. The 12-row brand dim is broadcast. Mega-cell skew
(city centers) is handled by AQE skew-join splitting; the coarse cell size
adapts to the brand's max radius so ring width never exceeds 3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..geo import haversine_m
from ..tiling import coarse_cell_id, coarse_mult_for_radius, explode_ring3x3

# Priorities exactly as the reference assigns them (dao/poi_base.py:254-683).
PRIO_REF = 930
PRIO_NAME_CSN_CITY = 965
PRIO_NAME_FULL_ADDR = 940
PRIO_NAME_STREET_HN = 950
PRIO_NAME_PARTIAL = 970
PRIO_NAME_ONLY = 980
PRIO_NONAME = 990

MATCH_OUT_COLS = ("page_id", "osm_id", "node_type", "stage", "priority", "distance")


def type_predicate(poi_type: Column, shop: Column, amenity: Column, railway: Column) -> Column:
    """Per-brand tag predicate (analogue of ``utils/poitypes.py:15-96``)."""
    return (
        F.when(poi_type == "shop", shop.isin("convenience", "supermarket"))
        .when(poi_type == "fuel", amenity == "fuel")
        .when(poi_type == "post_office", amenity == "post_office")
        .when(poi_type == "bank", amenity == "bank")
        .when(poi_type == "railway_station", railway == "station")
        .otherwise(F.lit(False))
    )


def with_common(pages_geo: DataFrame, common: DataFrame) -> DataFrame:
    """J1: attach the brand dimension (broadcast — create_db.py:253-256)."""
    return pages_geo.join(F.broadcast(common), pages_geo.name == common.poi_name, "inner")


def _prep_pois(pois: DataFrame, brand_rows: list) -> DataFrame:
    """Project candidates + precompute per-POI brand-regex hits.

    The reference evaluates ``LOWER(name) ~* LOWER(:name)`` inside every
    per-POI SQL probe (poi_base.py:193-211). Naively porting that as an
    rlike against the joined brand's pattern column recompiles the regex
    PER JOINED ROW — catastrophic in mega-cells. Instead each candidate is
    tagged ONCE with the array of brand ids whose search (and avoid) regex
    matches its name: 12 literal-pattern rlikes evaluated per candidate,
    compiled once per task by codegen. The hot join path then reduces to an
    integer ``array_contains``.
    """
    name_lc = F.lower(F.col("name"))
    brand_hits = F.array_compact(
        F.array(
            *[F.when(name_lc.rlike(rx), F.lit(int(pc))) for pc, rx, _ in brand_rows]
        )
    )
    avoid_pairs = [(pc, av) for pc, _, av in brand_rows if av]
    avoid_hits = (
        F.array_compact(
            F.array(*[F.when(name_lc.rlike(av), F.lit(int(pc))) for pc, av in avoid_pairs])
        )
        if avoid_pairs
        else F.array().cast("array<int>")
    )
    return pois.select(
        "osm_id",
        "node_type",
        F.col("name").alias("osm_name"),
        "shop",
        "amenity",
        "railway",
        F.col("addr_city").alias("o_city"),
        F.col("addr_street").alias("o_street"),
        F.col("addr_housenumber").alias("o_hn"),
        F.col("addr_conscriptionnumber").alias("o_csn"),
        "ref_value",
        F.col("lat").alias("o_lat"),
        F.col("lon").alias("o_lon"),
        brand_hits.alias("brand_hits"),
        avoid_hits.alias("avoid_hits"),
    )


def match_cascade(pages_geo: DataFrame, pois: DataFrame, common: DataFrame) -> DataFrame:
    """All pages × candidate OSM POIs → best match per page.

    ``pages_geo``: output of :func:`..extract.geotag.geotag_pages`.
    Returns one row per matched page: page_id, osm_id, node_type, stage,
    priority, distance (meters, full precision — round at the edge).
    """
    # 12-row dimension: plan-time constants (regex set, max radius), not a
    # data dependency — same trick as the reference's pc_id→type dict
    # (online_poi_matching.py:44-45), but resolved once per plan.
    common_rows = common.collect()
    brand_rows = [(r["pc_id"], r["search_rx"], r["avoid_rx"]) for r in common_rows]
    max_radius = max(r["d_perfect"] for r in common_rows)
    p = with_common(pages_geo, common)
    o = _prep_pois(pois, brand_rows)

    dist = haversine_m(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon"))
    tpred = type_predicate(F.col("poi_type"), F.col("shop"), F.col("amenity"), F.col("railway"))
    name_ok = F.array_contains(F.col("brand_hits"), F.col("pc_id"))
    avoid_ok = F.when(
        F.col("avoid_rx").isNotNull(),
        ~F.coalesce(F.array_contains(F.col("avoid_hits"), F.col("pc_id")), F.lit(False)),
    ).otherwise(F.lit(True))

    def arm(df: DataFrame, stage: int, priority: int) -> DataFrame:
        return df.select(
            "page_id",
            "osm_id",
            "node_type",
            F.lit(stage).alias("stage"),
            F.lit(priority).alias("priority"),
            dist.alias("distance"),
        )

    # -- stage 1: additional-ref equality (930) — pure equi-join, no radius
    s1 = arm(
        p.where(F.col("ref").isNotNull() & F.col("ref_name").isNotNull())
        .join(o.where(F.col("ref_value").isNotNull()), F.col("ref") == F.col("ref_value"))
        .where(tpred),
        1,
        PRIO_REF,
    )

    # -- stage 3: name + conscriptionnumber + city (965)
    s3 = arm(
        p.where(F.col("csn").isNotNull())
        .join(
            o.where(F.col("o_csn").isNotNull()),
            (F.lower(F.col("csn")) == F.lower(F.col("o_csn")))
            & (F.lower(F.col("city")) == F.lower(F.col("o_city"))),
        )
        .where(tpred & name_ok),
        3,
        PRIO_NAME_CSN_CITY,
    )

    # -- stage 4: name + city + street + housenumber (940)
    s4 = arm(
        p.join(
            o,
            (F.lower(F.col("city")) == F.lower(F.col("o_city")))
            & (F.lower(F.col("street")) == F.lower(F.col("o_street")))
            & (F.lower(F.col("housenumber")) == F.lower(F.col("o_hn"))),
        ).where(tpred & name_ok),
        4,
        PRIO_NAME_FULL_ADDR,
    )

    # -- stage 5: the radius query — coarse-cell 3×3 ring join, 5 arms at once
    mult = coarse_mult_for_radius(max_radius)
    probe = explode_ring3x3(p, "lat", "lon", mult, out="probe_cell")
    cand = o.withColumn("cand_cell", coarse_cell_id(F.col("o_lat"), F.col("o_lon"), mult))
    joined = probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))

    street_eq = F.lower(F.col("street")) == F.lower(F.col("o_street"))
    hn_eq = F.lower(F.col("housenumber")) == F.lower(F.col("o_hn"))
    prio5 = (
        F.when(name_ok & street_eq & hn_eq & (dist < F.col("d_perfect")), PRIO_NAME_STREET_HN)
        .when(name_ok & (street_eq | hn_eq) & (dist < F.col("d_safe")), PRIO_NAME_PARTIAL)
        .when(name_ok & (dist < F.col("d_safe")), PRIO_NAME_ONLY)
        .when(avoid_ok & (dist < F.col("d_unsafe")), PRIO_NONAME)
    )
    s5 = (
        joined.where(tpred)
        .withColumn("priority", prio5)
        .where(F.col("priority").isNotNull())
        .select(
            "page_id",
            "osm_id",
            "node_type",
            F.lit(5).alias("stage"),
            "priority",
            dist.alias("distance"),
        )
    )

    all_arms = s1.unionByName(s3).unionByName(s4).unionByName(s5)

    # "first non-empty stage wins; within stage ORDER BY priority, distance"
    # (poi_base.py:720-786) + deterministic osm_id tie-break.
    w = Window.partitionBy("page_id").orderBy("stage", "priority", "distance", "osm_id")
    return (
        all_arms.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )


def match_pages(pages_geo: DataFrame, pois: DataFrame, common: DataFrame) -> DataFrame:
    """Full outcome table: every geotagged page, matched or new.

    ``poi_new`` mirrors the reference's unmatched → new-POI flag
    (``libs/online_poi_matching.py:64, 334``).
    """
    best = match_cascade(pages_geo, pois, common)
    return (
        pages_geo.select("page_id", "url", "name", "lat", "lon", "cell_id")
        .join(best, "page_id", "left")
        .withColumn("poi_new", F.col("osm_id").isNull())
    )

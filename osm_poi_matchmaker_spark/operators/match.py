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


def _prep_pois(pois: DataFrame, brand_specs: list) -> DataFrame:
    """Project candidates + precompute per-POI brand eligibility.

    The reference evaluates the tag predicate and ``LOWER(name) ~*
    LOWER(:name)`` inside every per-POI SQL probe (poi_base.py:193-211,
    utils/poitypes.py). Porting those naively puts a regex compile and a
    CASE chain on every JOINED row — catastrophic in mega-cells. Instead
    each candidate is tagged ONCE (12 literal-pattern rlikes + 12 tag
    checks, codegen-compiled once per task) with:

      type_hits   — brand ids whose tag predicate this POI satisfies
      cand_brands — brand ids satisfying tag predicate AND name regex
      avoid_hits  — brand ids whose avoid-name regex matches

    plus pre-lowercased address keys, so the 10^7-row hot path is integer
    ``array_contains`` + direct string equality only.
    """
    name_lc = F.lower(F.col("name"))

    def type_ok(ptype: str):
        return type_predicate(
            F.lit(ptype), F.col("shop"), F.col("amenity"), F.col("railway")
        )

    type_hits = F.array_compact(
        F.array(
            *[F.when(type_ok(pt), F.lit(int(pc))) for pc, _, _, pt in brand_specs]
        )
    )
    cand_brands = F.array_compact(
        F.array(
            *[
                F.when(type_ok(pt) & name_lc.rlike(rx), F.lit(int(pc)))
                for pc, rx, _, pt in brand_specs
            ]
        )
    )
    avoid_pairs = [(pc, av) for pc, _, av, _ in brand_specs if av]
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
        F.lower(F.col("addr_city")).alias("lc_o_city"),
        F.lower(F.col("addr_street")).alias("lc_o_street"),
        F.lower(F.col("addr_housenumber")).alias("lc_o_hn"),
        F.lower(F.col("addr_conscriptionnumber")).alias("lc_o_csn"),
        "ref_value",
        F.col("lat").alias("o_lat"),
        F.col("lon").alias("o_lon"),
        type_hits.alias("type_hits"),
        cand_brands.alias("cand_brands"),
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
    brand_specs = [
        (r["pc_id"], r["search_rx"], r["avoid_rx"], r["poi_type"]) for r in common_rows
    ]
    max_radius = max(r["d_perfect"] for r in common_rows)
    # The 4 arms all consume the same (pages ⋈ common) and prepared-POI
    # frames; persist them so the regex extraction / brand tagging runs
    # once, not once per arm. On the production pipeline this is the
    # extract-stage checkpoint (plans/pipeline.py); here it is the
    # in-plan equivalent for standalone use.
    p = with_common(pages_geo, common).select(
        "*",
        F.lower(F.col("city")).alias("lc_city"),
        F.lower(F.col("street")).alias("lc_street"),
        F.lower(F.col("housenumber")).alias("lc_hn"),
        F.lower(F.col("csn")).alias("lc_csn"),
    ).persist()
    o = _prep_pois(pois, brand_specs).persist()

    dist = haversine_m(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon"))
    # hot-path predicates: integer array_contains only (see _prep_pois);
    # type_predicate/regexes were folded into the candidate-side arrays
    type_ok = F.array_contains(F.col("type_hits"), F.col("pc_id"))
    name_ok = F.array_contains(F.col("cand_brands"), F.col("pc_id"))
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
        .where(type_ok),
        1,
        PRIO_REF,
    )

    # -- stage 3: name + conscriptionnumber + city (965)
    s3 = arm(
        p.where(F.col("csn").isNotNull())
        .join(
            o.where(F.col("lc_o_csn").isNotNull()),
            (F.col("lc_csn") == F.col("lc_o_csn")) & (F.col("lc_city") == F.col("lc_o_city")),
        )
        .where(name_ok),
        3,
        PRIO_NAME_CSN_CITY,
    )

    # -- stage 4: name + city + street + housenumber (940)
    s4 = arm(
        p.join(
            o,
            (F.col("lc_city") == F.col("lc_o_city"))
            & (F.col("lc_street") == F.col("lc_o_street"))
            & (F.col("lc_hn") == F.col("lc_o_hn")),
        ).where(name_ok),
        4,
        PRIO_NAME_FULL_ADDR,
    )

    # -- stage 5: the radius query — coarse-cell 3×3 ring join, 5 arms at once
    mult = coarse_mult_for_radius(max_radius)
    probe = explode_ring3x3(p, "lat", "lon", mult, out="probe_cell")
    cand = o.withColumn("cand_cell", coarse_cell_id(F.col("o_lat"), F.col("o_lon"), mult))
    joined = probe.join(cand, F.col("probe_cell") == F.col("cand_cell"))

    # materialize distance/street/hn checks ONCE as columns — inlining the
    # haversine into each tier predicate quintuples the codegen'd
    # expression and blows Janino's 64 KB method limit (interpreted
    # fallback on the hot path)
    d = F.col("distance")
    prio5 = (
        F.when(name_ok & F.col("s_eq") & F.col("h_eq") & (d < F.col("d_perfect")), PRIO_NAME_STREET_HN)
        .when(name_ok & (F.col("s_eq") | F.col("h_eq")) & (d < F.col("d_safe")), PRIO_NAME_PARTIAL)
        .when(name_ok & (d < F.col("d_safe")), PRIO_NAME_ONLY)
        .when(avoid_ok & (d < F.col("d_unsafe")), PRIO_NONAME)
    )
    s5 = (
        joined.where(type_ok)
        .withColumn("distance", dist)
        .withColumn("s_eq", F.col("lc_street") == F.col("lc_o_street"))
        .withColumn("h_eq", F.col("lc_hn") == F.col("lc_o_hn"))
        .withColumn("priority", prio5)
        .where(F.col("priority").isNotNull())
        .select(
            "page_id",
            "osm_id",
            "node_type",
            F.lit(5).alias("stage"),
            "priority",
            "distance",
        )
    )

    all_arms = s1.unionByName(s3).unionByName(s4).unionByName(s5)

    # "first non-empty stage wins; within stage ORDER BY priority, distance"
    # (poi_base.py:720-786) + deterministic osm_id tie-break.
    #
    # Expressed as min(struct(...)) rather than a row_number window: the
    # struct's lexicographic order IS the cascade order, and an aggregate
    # gets map-side partial combining — each shuffle partition ships one
    # candidate per page instead of every candidate. At mega-cell densities
    # that is the difference between shuffling millions and thousands.
    best = F.min(
        F.struct("stage", "priority", "distance", "osm_id", "node_type")
    ).alias("b")
    return all_arms.groupBy("page_id").agg(best).select(
        "page_id",
        F.col("b.osm_id").alias("osm_id"),
        F.col("b.node_type").alias("node_type"),
        F.col("b.stage").alias("stage"),
        F.col("b.priority").alias("priority"),
        F.col("b.distance").alias("distance"),
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

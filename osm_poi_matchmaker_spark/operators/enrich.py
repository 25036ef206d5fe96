"""Address-overwrite-from-OSM enrichment (post-match stage).

Reference behavior (``libs/online_poi_matching.py:64-199``): once a POI is
matched to an OSM object, the importer's address fields are overwritten
with "OSM truth" —

- ``poi_new`` → False for matched rows (``:66``);
- coordinates ← the OSM object's lat/lon, but only when BOTH differ
  (``:75`` — the reference tests ``lat != lat AND lon != lon``; quirk
  preserved);
- postcode ← ``smart_postcode_check`` preference chain (``:114-116``,
  ``:402-465``): the OSM POI's own ``addr:postcode`` tag > the postcode
  polygon containing the OSM point (``query_postcode_osm_external`` PIP,
  ``libs/osm.py:32-66``) > the provider postcode, skipping 0/'0'/empty
  sentinels;
- housenumber / city / street / conscriptionnumber ← the OSM ``addr:*``
  value when non-null and non-empty (``:131-173``), setting
  ``changed_from_osm`` when any differs from the current value.

Spark shape: the reference runs one OSM-cache lookup + one PIP SQL query
per row; here the whole enrichment is three set-based joins —

1. a sort-merge equi-join to the (big) ``osm_pois`` table on
   ``(osm_id, node_type)`` — the S5 keyed-cache lookup as a join;
2. the broadcast ray-cast PIP operator (operators/pip.py) over the matched
   OSM coordinates — polygons are the small side, the point side never
   shuffles;
3. a broadcast join to the city dimension for the provider postcode
   (the J9 lookup, ``dao/data_handlers.py:816-829``).

All overwrite rules are pure column expressions (JVM-side, codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pip import point_in_polygon

# smart_postcode_check's unusable-value sentinels
# (online_poi_matching.py:404 + ordered_postcode_check :461-465)
_PC_SENTINELS = ("", "0", "None", "NaN")


def _clean_pc(c: Column) -> Column:
    return F.when(c.isin(*_PC_SENTINELS), F.lit(None)).otherwise(c)


def enrich_matched_from_osm(
    pages_geo: DataFrame,
    best: DataFrame,
    pois: DataFrame,
    postcode_polys: DataFrame,
    city_dim: DataFrame,
) -> DataFrame:
    """Overwrite matched pages' address fields with OSM truth.

    ``pages_geo``: geotagged pages (page_id, lat, lon, city, street,
    housenumber, csn, ...). ``best``: the cascade's winning match per page
    (page_id, osm_id, node_type). ``pois``: the OSM candidate table with
    ``addr_*`` tags. ``postcode_polys``: boundary='postal_code' polygons
    (poly_id, postcode, way_wkt). ``city_dim``: (city_name,
    city_post_code) dimension.

    The reference gates all of this behind per-provider flags
    (``do_not_export_addr_tags``, ``preserve_original_post_code``,
    ``online_poi_matching.py:91-93``); both default to False, which is the
    behavior implemented here.
    """
    matched = F.col("osm_id").isNotNull()

    osm = pois.select(
        "osm_id",
        "node_type",
        F.col("addr_city").alias("o_city"),
        F.col("addr_street").alias("o_street"),
        F.col("addr_housenumber").alias("o_housenumber"),
        F.col("addr_conscriptionnumber").alias("o_csn"),
        F.col("addr_postcode").alias("o_postcode"),
        F.col("lat").alias("o_lat"),
        F.col("lon").alias("o_lon"),
    )
    m = (
        pages_geo.select("page_id", "lat", "lon", "city", "street", "housenumber", "csn")
        .join(best.select("page_id", "osm_id", "node_type"), "page_id", "left")
        .join(osm, ["osm_id", "node_type"], "left")
    )

    # PIP postcode of the matched OSM point (query_postcode_osm_external's
    # lat/lon query, libs/osm.py:32-49) — broadcast polygons, no shuffle
    located = point_in_polygon(
        m.where(matched).select(
            "page_id", F.col("o_lat").alias("lat"), F.col("o_lon").alias("lon")
        ),
        postcode_polys,
    )
    queried = located.join(
        F.broadcast(postcode_polys.select("poly_id", "postcode")), "poly_id", "left"
    ).select("page_id", F.col("postcode").alias("q_postcode"))
    m = m.join(queried, "page_id", "left")

    # provider postcode via the city dimension (J9 insert-time lookup)
    dim = city_dim.select(
        F.col("city_name").alias("city"),
        F.col("city_post_code").alias("provider_postcode"),
    ).dropDuplicates(["city"])
    m = m.join(F.broadcast(dim), "city", "left")

    def overwrite(osm_c: Column, cur: Column) -> Column:
        return F.when(matched & osm_c.isNotNull() & (osm_c != ""), osm_c).otherwise(cur)

    def changed(osm_c: Column, cur: Column) -> Column:
        return matched & osm_c.isNotNull() & (osm_c != "") & ~osm_c.eqNullSafe(cur)

    coord_differs = (F.col("o_lat") != F.col("lat")) & (F.col("o_lon") != F.col("lon"))
    new_pc = F.coalesce(
        _clean_pc(F.col("o_postcode")),
        _clean_pc(F.col("q_postcode")),
        _clean_pc(F.col("provider_postcode")),
    )
    return m.select(
        "page_id",
        "osm_id",
        (~matched).alias("poi_new"),
        F.when(matched & coord_differs, F.col("o_lat")).otherwise(F.col("lat")).alias("lat"),
        F.when(matched & coord_differs, F.col("o_lon")).otherwise(F.col("lon")).alias("lon"),
        F.when(matched, new_pc).otherwise(F.col("provider_postcode")).alias("postcode"),
        overwrite(F.col("o_city"), F.col("city")).alias("city"),
        overwrite(F.col("o_street"), F.col("street")).alias("street"),
        overwrite(F.col("o_housenumber"), F.col("housenumber")).alias("housenumber"),
        overwrite(F.col("o_csn"), F.col("csn")).alias("csn"),
        (
            changed(F.col("o_housenumber"), F.col("housenumber"))
            | changed(F.col("o_city"), F.col("city"))
            | changed(F.col("o_street"), F.col("street"))
            | changed(F.col("o_csn"), F.col("csn"))
        ).alias("changed_from_osm"),
    )


def attach_live_tags(
    matched: DataFrame, cache: DataFrame, api: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """S16 live-tag enrichment set-wide (online_poi_matching.py:238-324 +
    dao/data_handlers.py:342-398): the reference walks matched rows one by
    one, consulting the ``poi_osm_cache`` table per (osm_id, object_type)
    and calling the OSM API on a miss, writing fetched objects (and, for
    ways, every ``nd`` member node from one NodesGet batch) back through
    ``get_or_create_cache``. At 10^12 scale there is no live API — ``api``
    is the stored OSM-objects table standing in for it (SURVEY §2.1 S16).

    Reference semantics preserved:
      * ways and nodes read through the cache, API only on miss
        (:244-252, :291-297);
      * RELATIONS NEVER TOUCH THE CACHE — the reference always live-fetches
        them by ``abs(osm_id)`` and writes nothing back (:317-326);
      * a failed fetch (no API row) leaves osm_live_tags NULL after RETRY;
      * cache write-back = the fetched way/node itself plus, for ways, the
        ``nd`` member nodes resolved against the API in one batch
        (:261-279); ``get_or_create`` ⇒ only keys not already cached are
        appended, deduplicated.

    Returns ``(enriched, cache_appends)``. ``cache`` and ``api`` are
    dimension-sized next to the page corpus → broadcast joins; the matched
    side never shuffles.

    Columns: matched(page_id, osm_id, node_type); cache/api(osm_id,
    node_type, live_tags, osm_version[, nd for api ways]).
    """
    is_rel = F.col("node_type") == "relation"
    c = F.broadcast(
        cache.select(
            F.col("osm_id").alias("c_id"),
            F.col("node_type").alias("c_type"),
            F.col("live_tags").alias("c_tags"),
        )
    )
    a = F.broadcast(
        api.select(
            F.col("osm_id").alias("a_id"),
            F.col("node_type").alias("a_type"),
            F.col("live_tags").alias("a_tags"),
            F.col("osm_version").alias("a_version"),
            F.col("nd").alias("a_nd"),
        )
    )
    j = (
        matched.join(
            c,
            ~is_rel & (F.col("osm_id") == F.col("c_id")) & (F.col("node_type") == F.col("c_type")),
            "left",
        )
        .join(
            a,
            F.when(
                is_rel,
                (F.abs(F.col("osm_id")) == F.col("a_id")) & (F.col("a_type") == "relation"),
            ).otherwise(
                (F.col("osm_id") == F.col("a_id")) & (F.col("node_type") == F.col("a_type"))
            ),
            "left",
        )
    )
    enriched = j.select(
        "page_id",
        "osm_id",
        "node_type",
        F.when(is_rel, F.col("a_tags"))
        .otherwise(F.coalesce(F.col("c_tags"), F.col("a_tags")))
        .alias("osm_live_tags"),
    )

    fetched = j.where(
        ~is_rel & F.col("c_id").isNull() & F.col("a_id").isNotNull()
    ).select("osm_id", "node_type", "a_tags", "a_version", "a_nd")
    self_rows = fetched.select(
        "osm_id", "node_type", F.col("a_tags").alias("live_tags"),
        F.col("a_version").alias("osm_version"),
    )
    api_nodes = api.where(F.col("node_type") == "node").select(
        F.col("osm_id").alias("n_id"),
        F.col("live_tags").alias("n_tags"),
        F.col("osm_version").alias("n_version"),
    )
    way_member_rows = (
        fetched.where(F.col("node_type") == "way")
        .select(F.explode("a_nd").alias("n_id"))
        .join(F.broadcast(api_nodes), "n_id", "inner")
        .select(
            F.col("n_id").alias("osm_id"),
            F.lit("node").alias("node_type"),
            F.col("n_tags").alias("live_tags"),
            F.col("n_version").alias("osm_version"),
        )
    )
    cache_appends = (
        self_rows.unionByName(way_member_rows)
        .dropDuplicates(["osm_id", "node_type"])
        .join(
            cache.select(
                F.col("osm_id"), F.col("node_type"), F.lit(1).alias("_hit")
            ),
            ["osm_id", "node_type"],
            "left_anti",
        )
    )
    return enriched, cache_appends

"""DuckDB-oracle SQL mirroring synth.py + the engine operators.

Every fragment here is generated from the same constants as the DataFrame
builders in :mod:`synth` (BRANDS, hash multipliers, jitter classes) so the
two cannot drift silently; tests/test_oracle_parity.py asserts value-level
equality between the Spark plans and these SQL texts.

The SQL is deliberately ANSI-portable (CONCAT / CASE / CAST / integer mod /
regexp_extract / window QUALIFY) — DuckDB runs it as the driver's oracle,
and the arithmetic is bit-identical to the Spark side (integer ops exact,
one final double division, haversine differs ≤1e-11 m → outputs rounded).
"""

from __future__ import annotations

from .synth import BRANDS, HOT_LAT_E5, HOT_LON_E5, M_HOTLAT, M_HOTLON, M_LAT, M_LON

# --------------------------------------------------------------- placement
def _lat_e5(k: str) -> str:
    return (
        f"(CASE WHEN {k} % 5 < 2 THEN {HOT_LAT_E5} + ({k} * {M_HOTLAT}) % 4000 - 2000 "
        f"ELSE 4575000 + ({k} * {M_LAT}) % 280000 END)"
    )


def _lon_e5(k: str) -> str:
    return (
        f"(CASE WHEN {k} % 5 < 2 THEN {HOT_LON_E5} + ({k} * {M_HOTLON}) % 6000 - 3000 "
        f"ELSE 1615000 + ({k} * {M_LON}) % 670000 END)"
    )


def _brand_name(k: str) -> str:
    whens = " ".join(f"WHEN {pc_id} THEN '{name}'" for pc_id, _, name, *_ in BRANDS)
    return f"(CASE {k} % 12 {whens} ELSE '' END)"


# ------------------------------------------------------------------- pages
def pages_cte() -> str:
    k = "c_custkey"
    name = _brand_name(k)
    addr = (
        f"(CASE WHEN {k} % 17 = 3 THEN '' "
        f"WHEN {k} % 19 = 11 THEN CONCAT(' Street ', CAST({k} % 30 AS STRING), ' ', CAST({k} % 40 + 1 AS STRING)) "
        f"ELSE CONCAT(' City', CAST({k} % 50 AS STRING), ', Street ', CAST({k} % 30 AS STRING), ' ', CAST({k} % 40 + 1 AS STRING)) END)"
    )
    text = (
        f"CONCAT('POI ', {name}, ' | geo:', CAST({_lat_e5(k)} AS STRING), ',', "
        f"CAST({_lon_e5(k)} AS STRING), ' | addr:', {addr}, "
        f"CASE WHEN {k} % 37 = 0 THEN CONCAT(' hrsz ', CAST({k} AS STRING), '/2') ELSE '' END, "
        f"CASE WHEN {k} % 12 = 9 THEN CONCAT(' ref MAV', CAST({k} % 97 AS STRING)) ELSE '' END, "
        f"CASE WHEN {k} % 53 = 0 THEN CONCAT(' uniq Hall ', CAST({k} % 5 AS STRING)) ELSE '' END)"
    )
    return (
        "pages AS (SELECT "
        f"{k} AS page_id, "
        f"CONCAT('https://cc.example/', CAST({k} AS STRING)) AS url, "
        f"{text} AS text, "
        f"CASE WHEN {k} % 10 < 8 THEN 'hu' ELSE 'de' END AS lang "
        "FROM customer)"
    )


# extraction — patterns identical to extract/geotag.py
PAGES_X_CTE = r"""pages_x AS (
  SELECT page_id, url,
    NULLIF(regexp_extract(text, 'POI (.*) \| geo', 1), '') AS name,
    CAST(NULLIF(regexp_extract(text, 'geo:([0-9]+),', 1), '') AS DOUBLE) / 100000.0 AS lat,
    CAST(NULLIF(regexp_extract(text, ',([0-9]+) \| addr', 1), '') AS DOUBLE) / 100000.0 AS lon,
    NULLIF(regexp_extract(text, 'addr: ([A-Za-z0-9]+),', 1), '') AS city,
    NULLIF(regexp_extract(text, '(Street [0-9]+) ', 1), '') AS street,
    NULLIF(regexp_extract(text, 'Street [0-9]+ ([0-9]+)', 1), '') AS housenumber,
    NULLIF(regexp_extract(text, 'hrsz ([0-9]+/[0-9]+)', 1), '') AS csn,
    NULLIF(regexp_extract(text, 'ref (MAV[0-9]+)', 1), '') AS ref,
    NULLIF(regexp_extract(text, 'uniq (.*)$', 1), '') AS uname
  FROM pages WHERE lang = 'hu')"""


# -------------------------------------------------------------------- pois
def pois_cte() -> str:
    a = "a"
    base_name = _brand_name(a)
    name = f"(CASE WHEN {a} % 7 = 5 THEN CONCAT('Random Bolt ', CAST({a} AS STRING)) ELSE {base_name} END)"
    name = f"(CASE WHEN {a} % 12 = 11 AND {a} % 3 = 0 THEN 'OTP Travel' ELSE {name} END)"
    name = f"(CASE WHEN {a} % 41 = 0 THEN CONCAT('Hall ', CAST({a} % 5 AS STRING)) ELSE {name} END)"
    name = f"(CASE WHEN {a} % 29 = 0 THEN UPPER({name}) ELSE {name} END)"
    lat_j = (
        f"({_lat_e5(a)} + CASE {a} % 7 WHEN 1 THEN 8 WHEN 2 THEN 40 WHEN 3 THEN 180 "
        f"WHEN 4 THEN 400 WHEN 5 THEN 30 ELSE 0 END)"
    )
    lon_j = f"({_lon_e5(a)} + CASE WHEN {a} % 7 = 6 THEN 2000 ELSE 0 END)"
    return (
        "pois AS (SELECT "
        f"CAST(CASE WHEN {a} % 3 = 2 THEN -{a} ELSE {a} END AS BIGINT) AS osm_id, "
        f"CASE {a} % 3 WHEN 0 THEN 'node' WHEN 1 THEN 'way' ELSE 'relation' END AS node_type, "
        f"{name} AS name, "
        f"CASE WHEN {a} % 12 IN (0, 5) THEN 'convenience' WHEN {a} % 12 IN (1, 2, 3, 4) THEN 'supermarket' END AS shop, "
        f"CASE WHEN {a} % 12 IN (6, 7) THEN 'fuel' WHEN {a} % 12 = 8 THEN 'post_office' "
        f"WHEN {a} % 12 IN (10, 11) THEN 'bank' END AS amenity, "
        f"CASE WHEN {a} % 12 = 9 THEN 'station' END AS railway, "
        f"CONCAT('City', CAST({a} % 50 AS STRING)) AS addr_city, "
        f"CONCAT('Street ', CAST({a} % 30 AS STRING)) AS addr_street, "
        f"CAST(CASE WHEN {a} % 11 = 0 THEN ({a} + 1) % 40 + 1 ELSE {a} % 40 + 1 END AS STRING) AS addr_housenumber, "
        f"CASE WHEN {a} % 37 = 0 THEN CONCAT(CAST({a} AS STRING), '/2') END AS addr_conscriptionnumber, "
        f"CASE WHEN {a} % 4 = 0 THEN CAST(1000 + {a} % 25 AS STRING) "
        f"WHEN {a} % 4 = 1 THEN '0' END AS addr_postcode, "
        f"CASE WHEN {a} % 12 = 9 THEN CONCAT('MAV', CAST({a} % 97 AS STRING)) END AS ref_value, "
        f"CAST({lat_j} AS DOUBLE) / 100000.0 AS lat, "
        f"CAST({lon_j} AS DOUBLE) / 100000.0 AS lon "
        f"FROM (SELECT p_partkey AS {a} FROM part))"
    )


def common_cte() -> str:
    rows = []
    for pc_id, code, name, ptype, rx, avoid, dp, ds, du, ref in BRANDS:
        avoid_s = f"'{avoid}'" if avoid else "CAST(NULL AS STRING)"
        ref_s = f"'{ref}'" if ref else "CAST(NULL AS STRING)"
        rows.append(f"({pc_id}, '{code}', '{name}', '{ptype}', '{rx}', {avoid_s}, {dp}, {ds}, {du}, {ref_s})")
    return (
        "common AS (SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(pc_id, poi_code, poi_name, poi_type, search_rx, avoid_rx, d_perfect, d_safe, d_unsafe, ref_name))"
    )


# --------------------------------------------------------------- operators
HAV = (
    "(2.0 * 6371000.0 * ASIN(SQRT("
    "SIN(RADIANS(o.lat - p.lat) / 2.0) * SIN(RADIANS(o.lat - p.lat) / 2.0) "
    "+ COS(RADIANS(p.lat)) * COS(RADIANS(o.lat)) "
    "* SIN(RADIANS(o.lon - p.lon) / 2.0) * SIN(RADIANS(o.lon - p.lon) / 2.0))))"
)
TPRED = (
    "(CASE p.poi_type "
    "WHEN 'shop' THEN o.shop IN ('convenience', 'supermarket') "
    "WHEN 'fuel' THEN o.amenity = 'fuel' "
    "WHEN 'post_office' THEN o.amenity = 'post_office' "
    "WHEN 'bank' THEN o.amenity = 'bank' "
    "WHEN 'railway_station' THEN o.railway = 'station' "
    "ELSE FALSE END)"
)
NAMEOK = "regexp_matches(lower(o.name), p.search_rx)"
AVOIDOK = "(p.avoid_rx IS NULL OR NOT regexp_matches(lower(o.name), p.avoid_rx))"
STREETEQ = "lower(p.street) = lower(o.addr_street)"
HNEQ = "lower(p.housenumber) = lower(o.addr_housenumber)"

CELL_SQL = (
    "(CAST(FLOOR(({lat} + 90.0) * 640.0) AS BIGINT) * 262144 "
    "+ CAST(FLOOR(({lon} + 180.0) * 640.0) AS BIGINT))"
)


def base_ctes() -> str:
    return f"WITH {pages_cte()}, {PAGES_X_CTE}, {pois_cte()}, {common_cte()}"


def match_arms_sql(attr_radius: float | None = None) -> str:
    """The 4-stage cascade as UNION ALL arms (oracle side: no cell join —
    the ring join's coverage guarantee makes plain predicates equivalent).

    ``attr_radius``: DuckDB twin of ``match_cascade(name_arm_radius_m=R)``
    — bounds the attribute arms (s2/s3/s4) by ``distance < R``. The
    Spark side's cell-ring join is a superset of the radius pairs and
    post-filters the exact predicate, so a plain distance predicate here
    is the identical relation.
    """
    bound = f" AND {HAV} < {float(attr_radius)!r}" if attr_radius is not None else ""
    return f"""
p AS (SELECT px.*, c.pc_id, c.poi_code, c.poi_type, c.search_rx, c.avoid_rx, c.d_perfect, c.d_safe, c.d_unsafe, c.ref_name
      FROM pages_x px JOIN common c ON px.name = c.poi_name
      WHERE px.lat IS NOT NULL AND px.lon IS NOT NULL),
arms AS (
  SELECT p.page_id, o.osm_id, o.node_type, 1 AS stage, 930 AS priority, {HAV} AS distance, p.pc_id AS cand_pc, p.poi_code
  FROM p JOIN pois o ON p.ref = o.ref_value
  WHERE p.ref IS NOT NULL AND p.ref_name IS NOT NULL AND o.ref_value IS NOT NULL AND {TPRED}
  UNION ALL
  SELECT p.page_id, o.osm_id, o.node_type, 2, 930, {HAV}, p.pc_id, p.poi_code
  FROM p JOIN pois o ON lower(p.uname) = lower(o.name)
  WHERE p.uname IS NOT NULL AND {TPRED}{bound}
  UNION ALL
  SELECT p.page_id, o.osm_id, o.node_type, 3, 965, {HAV}, p.pc_id, p.poi_code
  FROM p JOIN pois o
    ON lower(p.csn) = lower(o.addr_conscriptionnumber) AND lower(p.city) = lower(o.addr_city)
  WHERE p.csn IS NOT NULL AND o.addr_conscriptionnumber IS NOT NULL AND {TPRED} AND {NAMEOK}{bound}
  UNION ALL
  SELECT p.page_id, o.osm_id, o.node_type, 4, 940, {HAV}, p.pc_id, p.poi_code
  FROM p JOIN pois o
    ON lower(p.city) = lower(o.addr_city) AND {STREETEQ} AND {HNEQ}
  WHERE {TPRED} AND {NAMEOK}{bound}
  UNION ALL
  SELECT page_id, osm_id, node_type, 5, priority, distance, cand_pc, poi_code FROM (
    SELECT p.page_id, o.osm_id, o.node_type, {HAV} AS distance, p.pc_id AS cand_pc, p.poi_code,
      CASE WHEN {NAMEOK} AND {STREETEQ} AND {HNEQ} AND {HAV} < p.d_perfect THEN 950
           WHEN {NAMEOK} AND ({STREETEQ} OR {HNEQ}) AND {HAV} < p.d_safe THEN 970
           WHEN {NAMEOK} AND {HAV} < p.d_safe THEN 980
           WHEN {AVOIDOK} AND {HAV} < p.d_unsafe THEN 990 END AS priority
    FROM p JOIN pois o ON {TPRED}
  ) WHERE priority IS NOT NULL
),
best AS (
  SELECT * FROM arms
  QUALIFY ROW_NUMBER() OVER (PARTITION BY page_id
    ORDER BY stage, priority, distance, osm_id, node_type, cand_pc) = 1
)"""

"""Export sinks — CSV / GeoJSON / OSM-XML renderings of match output.

Reference: ``libs/file_output.py`` (CSV :113-129, GeoJSON :237-314,
OSM-XML :317-784) and the grouped fan-out ``libs/export.py:57-166``.
The reference renders row-at-a-time with lxml; the engine renders each
format as a column expression (GeoJSON/CSV) or a deterministic per-row
string template (OSM-XML) and writes with ``partitionBy`` — the grouped
per-brand fan-out becomes a partitioned write instead of a process pool.

Parity quirks preserved:
- new POIs get NEGATIVE, DECREASING synthetic ids in OSM-XML
  (file_output.py:337,764) — implemented as ``-row_number`` over a pinned
  deterministic order;
- export ordering pinned by (poi_code, postcode, …) sort (W4,
  dao/poi_base.py:104-107) so byte-level diffs are stable run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def geojson_feature(df: DataFrame, props: list[str], lat: str = "lat", lon: str = "lon"):
    """Column: one GeoJSON Feature per row (properties from ``props``)."""
    prop_struct = F.struct(*[F.col(c).alias(c) for c in props])
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col(lon), F.col(lat)).alias("coordinates"),
            ).alias("geometry"),
            prop_struct.alias("properties"),
        )
    )


def to_geojson_collection(df: DataFrame, props: list[str]) -> str:
    """Whole-frame FeatureCollection string (driver-side assembly — only
    for parity-sized exports; at scale use write_geojson_partitioned)."""
    feats = [r["f"] for r in df.select(geojson_feature(df, props).alias("f")).collect()]
    return '{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}"


def global_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    out: str = "_rn",
    bucket_shift: int = 12,
):
    """Distributed 1-based row_number over (part_cols, ORDER BY order_col).

    ``Window.partitionBy(<few-valued cols>)`` funnels each logical
    partition through ONE task — the classic global-numbering
    scale-killer (Spark warns "No Partition Defined ... single
    partition"). Two-phase instead:

    1. rows bucket by aligned ranges of the order key
       (``order_col >> bucket_shift`` — order-preserving);
    2. per-(part, bucket) counts aggregate map-side (tiny), a window over
       the BUCKET ROWS (thousands, not billions) computes each bucket's
       starting offset;
    3. offsets broadcast back; the in-bucket row_number window runs one
       task per (part, bucket) — full parallelism.

    Requires a numeric ``order_col`` whose range order IS the desired
    order (ids, timestamps). Identical output to the single-window form
    (tested), plan scales with bucket count.
    """
    b = df.withColumn("_gb", F.shiftright(F.col(order_col), bucket_shift))
    counts = b.groupBy(*part_cols, "_gb").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.partitionBy(*part_cols).orderBy("_gb")
    offsets = counts.withColumn(
        "_off", F.sum("_n").over(w_off) - F.col("_n")
    ).drop("_n")
    w_in = Window.partitionBy(*part_cols, "_gb").orderBy(order_col)
    return (
        b.join(F.broadcast(offsets), [*part_cols, "_gb"])
        .withColumn(out, F.col("_off") + F.row_number().over(w_in))
        .drop("_gb", "_off")
    )


def global_rank_by(
    df: DataFrame,
    order_exprs: list,
    out: str = "_rn",
    num_ranges: int = 64,
) -> DataFrame:
    """1-based global row_number over an ARBITRARY total order — the
    general form of :func:`global_row_number` for non-numeric sort keys
    (string address columns, mixed null ordering).

    ``Window.orderBy(...)`` alone funnels the whole table through one
    task. Two-phase instead: ``repartitionByRange`` on the order
    expressions (sampled range boundaries — order-preserving across
    partitions, ties co-located), per-range counts aggregate to one row
    per range, each range's starting offset comes from a triangular
    self-join over those ≤``num_ranges`` count rows (≤ num_ranges²
    pairs — no partitionless window anywhere in the plan), offsets
    broadcast back and the in-range row_number runs one task per range.
    Final ranks are positions in the total order, so they are invariant
    to where the sampled range boundaries land. The order must be TOTAL
    (include a tiebreaker column) for deterministic output.
    """
    b = df.repartitionByRange(num_ranges, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = b.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    lower = counts.select(
        F.col("_pid").alias("_bpid"), F.col("_n").alias("_bn")
    )
    offsets = (
        counts.join(F.broadcast(lower), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_bn"), F.lit(0)).alias("_off"))
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_exprs)
    return (
        b.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_off") + F.row_number().over(w_in))
        .drop("_pid", "_off")
    )


def xml_attr_escape(col: F.Column) -> F.Column:
    """XML attribute escaping (& < > ") — what the reference gets for free
    from lxml's serializer (libs/file_output.py add_osm_node tag attrs)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;"))


def osm_xml_nodes(
    df: DataFrame,
    tag_cols: list[str],
    lat: str = "lat",
    lon: str = "lon",
    tag_map: str | None = None,
):
    """DataFrame of rendered ``<node>`` XML fragments with reference id
    semantics: matched rows keep osm_id, new rows get -1, -2, … in pinned
    (page_id) order. ``tag_map`` names an optional map<string,string>
    column (the poi_common brand payload merged by F20) whose entries
    render as additional escaped ``<tag>`` lines in key order —
    deterministic output for a distributed sink."""
    # two-phase distributed numbering — NOT a single-partition window
    df = global_row_number(df, ["poi_new"], "page_id", out="_rn")
    xml_id = F.when(~F.col("poi_new"), F.col("osm_id")).otherwise(
        -F.col("_rn").cast("long")
    )
    pieces = [
        F.when(
            F.col(c).isNotNull(),
            F.concat(
                F.lit(f'  <tag k="{c}" v="'),
                F.col(c).cast("string"),
                F.lit('"/>\n'),
            ),
        ).otherwise(F.lit(""))
        for c in tag_cols
    ]
    if tag_map is not None:
        # array_sort on array<struct> orders by the first field (key):
        # deterministic tag order regardless of map layout
        map_lines = F.array_join(
            F.transform(
                F.array_sort(F.map_entries(F.col(tag_map))),
                lambda e: F.concat(
                    F.lit('  <tag k="'),
                    e.key,
                    F.lit('" v="'),
                    xml_attr_escape(e.value),
                    F.lit('"/>\n'),
                ),
            ),
            "",
        )
        pieces.append(F.coalesce(map_lines, F.lit("")))
    tags = F.concat(*pieces)
    frag = F.concat(
        F.lit('<node id="'),
        xml_id.cast("string"),
        F.lit('" lat="'),
        F.col(lat).cast("string"),
        F.lit('" lon="'),
        F.col(lon).cast("string"),
        F.lit('">\n'),
        tags,
        F.lit("</node>"),
    )
    return df.select("page_id", F.col("poi_new"), frag.alias("xml"))


def osm_xml_object(node_type, xml_id, lat_s, lon_s, version, ts_s, children, tags):
    """Full K2 object render (libs/file_output.py:132-205, 363-409) as one
    column expression. Attribute set/order and defaults mirror
    ``add_osm_node``/``add_osm_way`` exactly: ``action="modify"``, the
    tool's synthetic ``user="osm_poi_matchmaker" uid="8635934"``, version
    defaulting to the literal '99999' when the OSM version is unknown
    (file_output.py:148,199), timestamp in TIMESTAMP_FORMAT
    (file_output.py:80-82). Nodes carry lat/lon attributes; ways and
    relations do not (add_osm_way has no lat/lon keys). ``children`` is
    the pre-rendered ``<nd ref>``/``<member>`` block ('' for nodes —
    generate_osm_xml appends nd refs for ways, file_output.py:372-376,
    and relationer-decoded members for relations, :397-403)."""
    v = F.coalesce(version.cast("string"), F.lit("99999"))
    common_tail = F.concat(
        F.lit('" user="osm_poi_matchmaker" uid="8635934" version="'),
        v,
        F.lit('" timestamp="'),
        ts_s,
        F.lit('">\n'),
    )
    node_head = F.concat(
        F.lit('<node action="modify" id="'),
        xml_id.cast("string"),
        F.lit('" lat="'),
        lat_s,
        F.lit('" lon="'),
        lon_s,
        common_tail,
    )
    wr_head = F.concat(
        F.lit("<"),
        node_type,
        F.lit(' action="modify" id="'),
        xml_id.cast("string"),
        common_tail,
    )
    head = F.when(node_type == "node", node_head).otherwise(wr_head)
    return F.concat(head, children, tags, F.lit("</"), node_type, F.lit(">"))


def ascii_numcoder_expr(col):
    """``ascii_numcoder`` (libs/file_output.py:103-110) as a pure column
    expression. Reference quirk preserved: the guard ``if i in
    range(0, 10, 1)`` compares a 1-char *string* against ints, so it is
    always False — every character, digits included, renders as
    ``str(ord(c))`` concatenated."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    return F.array_join(
        F.transform(chars, lambda ch: F.ascii(ch).cast("string")), ""
    )


def osm_xml_comment_block(
    osm_id,
    node_type,
    lat_s,
    lon_s,
    distance_m,
):
    """The per-row comment block ``generate_osm_xml`` appends after each
    object (libs/file_output.py:413-441), as one column expression.

    Reference semantics preserved exactly:
    - OSM link comment only when the object's id is positive (new POIs
      carry negative synthetic ids): `` OSM link: https://osm.org/{type}/{id} ``
      (file_output.py:208-219, 415-416);
    - original coordinates as the str() of the shapely point — which was
      built lat-first (libs/geo.py:20), so the WKT reads ``POINT (lat lon)``;
    - distance comment with the reference's asymmetric spacing: matched
      rows render `` ... distance: {d} m`` (no trailing space), unmatched
      rows render the literal `` ... distance: Non exist \\n`` INCLUDING
      the trailing newline inside the comment (file_output.py:425-433);
    - the #map=18 link built from ``poi_geom.x/.y`` — lat first again
      because of the same constructor quirk (file_output.py:222-234, 436).

    ``lat_s``/``lon_s`` are pre-rendered coordinate strings (the callers
    use an e5 integer grid so cross-engine float repr can't drift);
    ``distance_m`` is a LongType whole-metre column, NULL for new POIs.
    """
    link = F.when(
        osm_id.isNotNull() & (osm_id > 0),
        F.concat(
            F.lit("<!-- OSM link: https://osm.org/"),
            node_type,
            F.lit("/"),
            osm_id.cast("string"),
            F.lit(" -->\n"),
        ),
    ).otherwise(F.lit(""))
    orig = F.concat(
        F.lit("<!-- Original coordinates: POINT ("),
        lat_s,
        F.lit(" "),
        lon_s,
        F.lit(") -->\n"),
    )
    dist = F.when(
        distance_m.isNotNull(),
        F.concat(
            F.lit("<!-- OSM <-> POI distance: "),
            distance_m.cast("string"),
            F.lit(" m-->\n"),
        ),
    ).otherwise(F.lit("<!-- OSM <-> POI distance: Non exist \n-->\n"))
    maplink = F.concat(
        F.lit("<!-- OSM link: https://osm.org/#map=18/"),
        lat_s,
        F.lit("/"),
        lon_s,
        F.lit(" -->"),
    )
    return F.concat(link, orig, dist, maplink)


def write_grouped_exports(
    matched: DataFrame, out_dir: str, group_col: str = "name"
) -> None:
    """K5/K6: one export tree per brand group + new/existing split,
    expressed as partitioned writes (no process pool, no driver loop)."""
    (
        matched.withColumn(
            "export_group",
            F.when(F.col("poi_new"), F.lit("poi_new")).otherwise(F.lit("poi_existing")),
        )
        .repartition(group_col)
        .write.mode("overwrite")
        .partitionBy(group_col, "export_group")
        .parquet(out_dir)
    )

"""Geotag + address-span extraction over the ``pages`` table.

This is the Spark replacement for the reference's ~45 per-provider harvest
modules (``dataproviders/*.py``): instead of downloading and looping records
in Python, a single declarative projection extracts the POI payload from
``pages.text`` with built-in regexp functions (JVM-side, codegen'd — no
Python in the hot path per BASELINE.json input_hint).

Coordinates are embedded as micro-degree integers (``geo:LAT_E5,LON_E5``);
the coordinate-hygiene pass (:mod:`..geo`) then applies the reference's
``check_hu_boundary`` fixes (swap / re-point) vectorized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import with_fixed_hu_coordinates
from ..tiling import cell_id

# Extraction patterns — mirrored verbatim in the DuckDB oracle (synth_sql.py).
RX_NAME = r"POI (.*) \| geo"
RX_LAT = r"geo:([0-9]+),"
RX_LON = r",([0-9]+) \| addr"
RX_CITY = r"addr: ([A-Za-z0-9]+),"
RX_STREET = r"(Street [0-9]+) "
RX_HN = r"Street [0-9]+ ([0-9]+)"
RX_CSN = r"hrsz ([0-9]+/[0-9]+)"
RX_REF = r"ref (MAV[0-9]+)"
RX_UNAME = r"uniq (.*)$"


def _rx(col, pattern: str):
    got = F.regexp_extract(col, pattern, 1)
    return F.nullif(got, F.lit(""))


def geotag_pages_from_html(pages: DataFrame, lang: str = "hu") -> DataFrame:
    """Full-fidelity extract path: re-derive ``text`` from ``pages.html``
    (the reference's BeautifulSoup prettify + text-collection pipeline,
    soup.py:113-125, as an Arrow-batched pandas UDF) before geotagging.

    The per-url byte-parity invariant (html_to_text(html) == pages.text,
    enforced in tests/test_html_extract.py and the html_text_parity
    oracle query) makes this produce IDENTICAL rows to
    :func:`geotag_pages`; it exists so benchmarks can charge the real
    per-page parse cost the 100 TB pipeline pays.
    """
    from .html import html_text_udf

    return geotag_pages(
        pages.withColumn("text", html_text_udf(F.col("html"))), lang=lang
    )


def geotag_pages(pages: DataFrame, lang: str = "hu") -> DataFrame:
    """pages → geotagged POI records (one narrow projection, no shuffle).

    Language filter + regex extraction + coordinate hygiene + res-9 cell id.
    The lang filter and all extractions push down to the parquet scan
    (verify with ``.explain``: PushedFilters + pruned ReadSchema — html and
    warc_ts are never read).
    """
    t = F.col("text")
    lat_raw = (_rx(t, RX_LAT).cast("double") / F.lit(100000.0)).alias("lat")
    lon_raw = (_rx(t, RX_LON).cast("double") / F.lit(100000.0)).alias("lon")
    df = pages.where(F.col("lang") == lang).select(
        "page_id",
        "url",
        _rx(t, RX_NAME).alias("name"),
        lat_raw,
        lon_raw,
        _rx(t, RX_CITY).alias("city"),
        _rx(t, RX_STREET).alias("street"),
        _rx(t, RX_HN).alias("housenumber"),
        _rx(t, RX_CSN).alias("csn"),
        _rx(t, RX_REF).alias("ref"),
        _rx(t, RX_UNAME).alias("uname"),
    )
    # Drop non-geotagged rows on the RAW pair, not the fixed one: the fixed
    # coordinates are NULL exactly when the raw pair is NULL/zero
    # (check_hu_boundary's bad-input rule), and a filter phrased on the
    # FIXED columns gets pushed below the projections with its aliases
    # substituted — inlining the whole regexp+swap+repoint chain into the
    # predicate, which is what blew Janino's 64KB codegen limit.
    raw_ok = (
        F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & (F.col("lat") != 0.0)
        & (F.col("lon") != 0.0)
    )
    return with_fixed_hu_coordinates(df.where(raw_ok)).withColumn(
        "cell_id", cell_id(F.col("lat"), F.col("lon"))
    )

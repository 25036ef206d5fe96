"""Arrow-batched pandas UDF bridge for the scalar semantics layer.

The reference applies its cleaners one record at a time inside provider
loops; here every function is exposed as a vectorized pandas UDF (Arrow
batch in, Arrow batch out — the sanctioned slow path per BASELINE.json
"no per-row Python"). Regex-heavy Hungarian extraction can't be expressed
in built-in column functions, so this is exactly the pandas-UDF tier of
the design.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import hu_address as hu
from .opening_hours import compile_opening_hours
from .osm_misc import smart_postcode_check, url_tag_generator

_STREET_STRUCT = T.StructType(
    [
        T.StructField("street", T.StringType()),
        T.StructField("housenumber", T.StringType()),
        T.StructField("conscriptionnumber", T.StringType()),
    ]
)


@F.pandas_udf(T.StringType())
def clean_string_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.clean_string, na_action="ignore")


@F.pandas_udf(T.StringType())
def clean_city_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.clean_city, na_action="ignore")


# NULL sentinels of hu_address._NULL_SENTINELS, mirrored for codegen
_SENTINELS = ("NONE", "NAN", "NULL", "NULLNONE")


def clean_string_expr(c) -> F.Column:
    """``clean_string`` as a PURE column expression (whole-stage codegen,
    zero Python): unicode-whitespace collapse, NULL-sentinel mapping,
    leading/trailing ``-/, `` strip. Semantics pinned by the same goldens
    as the Python twin (tests/test_hu_address.py); the Python twin stays
    for driver-side composition (parsers, providers needing .map chains).
    """
    c = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(c.cast("string"), r"(?U)\s+", " ")
    pre_null = (s == "") | F.upper(s).isin(*_SENTINELS)
    t = F.regexp_replace(
        F.regexp_replace(F.trim(s), r"^[-/, ]+", ""), r"[-/, ]+$", ""
    )
    ok = (t != "") & ~F.upper(t).isin(*_SENTINELS)
    return F.when(~pre_null & ok, t)


def clean_postcode_udf(c) -> F.Column:
    """clean_postcode (address.py:291-295 analogue) as a column expr:
    clean_string, then the literal '0' → NULL."""
    s = clean_string_expr(c)
    return F.when(s != "0", s)


def clean_url_udf(c) -> F.Column:
    """clean_url as a column expr: collapse non-protocol '//'+ runs to
    '/', lowercase (Java lookbehind matches the Python regex)."""
    s = clean_string_expr(c)
    return F.lower(F.regexp_replace(s, r"(?<!:)//+", "/"))


def clean_email_udf(c) -> F.Column:
    """clean_email as a column expr: lowercase, space/comma → ';'
    (the reference's split/join chains reduce to a char translate)."""
    return F.translate(F.lower(clean_string_expr(c)), " ,", ";;")


@F.pandas_udf(T.StringType())
def clean_phone_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.clean_phone_to_str, na_action="ignore")


@F.pandas_udf(T.StringType())
def extract_phone_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.extract_phone_number, na_action="ignore")


@F.pandas_udf(_STREET_STRUCT)
def extract_street_udf(s: pd.Series) -> pd.DataFrame:
    rows = [hu.extract_street_housenumber_better_2(v) for v in s]
    return pd.DataFrame(rows, columns=["street", "housenumber", "conscriptionnumber"])


_ADDR_STRUCT = T.StructType(
    [
        T.StructField("postcode", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("housenumber", T.StringType()),
        T.StructField("conscriptionnumber", T.StringType()),
    ]
)


@F.pandas_udf(_ADDR_STRUCT)
def parse_address_udf(s: pd.Series) -> pd.DataFrame:
    """F4: structured address parse (hu_address_peg, wrapper-level
    semantics of the reference's extract_all_address_waxeye)."""
    from .hu_address_peg import parse_hu_address

    rows = [parse_hu_address(v) for v in s]
    return pd.DataFrame(
        rows, columns=["postcode", "city", "street", "housenumber", "conscriptionnumber"]
    )


@F.pandas_udf(T.StringType())
def url_tag_udf(base: pd.Series, website: pd.Series) -> pd.Series:
    return pd.Series(
        [url_tag_generator(b, w) for b, w in zip(base, website)], dtype="object"
    )


@F.pandas_udf(T.StringType())
def smart_postcode_udf(
    poi_pc: pd.Series, osm_pc: pd.Series, query_pc: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            smart_postcode_check({"postcode": p}, {"postcode": o}, q)
            for p, o, q in zip(poi_pc, osm_pc, query_pc)
        ],
        dtype="object",
    )


@F.pandas_udf(T.StringType())
def opening_hours_udf(
    non_stop: pd.Series, opens: pd.Series, closes: pd.Series,
    lb_start: pd.Series, lb_stop: pd.Series, ph_open: pd.Series,
) -> pd.Series:
    """opens/closes are 7-element arrays (mo..su)."""
    out = []
    for ns, o, c, ls, le, ph in zip(non_stop, opens, closes, lb_start, lb_stop, ph_open):
        o = list(o) if o is not None else [None] * 7
        c = list(c) if c is not None else [None] * 7
        out.append(
            compile_opening_hours(
                None if pd.isna(ns) else bool(ns),
                [None if pd.isna(v) else v for v in o],
                [None if pd.isna(v) else v for v in c],
                None if pd.isna(ls) else ls,
                None if pd.isna(le) else le,
                None if pd.isna(ph) else bool(ph),
            )
        )
    return pd.Series(out, dtype="object")


def clean_integer_expr(c):
    """F21: ``clean_integer_fields`` (data_handlers.py:41-108) as a pure
    column expression — no Python in the plan.

    Reference rules for string inputs: strip()=='' → NULL; accepted iff
    ``value.replace('.', '', 1).isdigit()`` (ASCII digits with at most one
    dot anywhere, NO sign — negatives are rejected, a reference quirk);
    accepted values go through ``int(float(value))`` so '7.25' → 7 and
    '.5' → 0. Everything else → NULL.
    """
    digitish = c.rlike(r"^\d*\.?\d*$") & c.rlike(r"\d")
    return (
        F.when(c.isNull() | (F.trim(c) == ""), F.lit(None).cast("int"))
        .when(digitish, F.floor(c.cast("double")).cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )


@F.pandas_udf(T.StringType())
def clean_street_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.clean_street, na_action="ignore")


@F.pandas_udf(T.StringType())
def clean_street_type_udf(s: pd.Series) -> pd.Series:
    return s.map(hu.clean_street_type, na_action="ignore")


@F.pandas_udf(T.StringType())
def set_branch_udf(s: pd.Series) -> pd.Series:
    """The full branch chain every provider record passes through:
    ``POIDatasetRaw.branch`` setter = clean_branch (poi_dataset.py:219-221),
    then ``add()`` re-cleans with clean_string (poi_dataset.py:1095)."""
    return s.map(lambda v: hu.clean_string(hu.clean_branch(v)), na_action="ignore")


def _set_housenumber(v):
    c = hu.clean_string(v)
    if not c:
        return None
    return c if len(c) < 16 else None


@F.pandas_udf(T.StringType())
def set_housenumber_udf(s: pd.Series) -> pd.Series:
    """``POIDatasetRaw.housenumber`` setter (poi_dataset.py:613-620):
    clean_string, falsy → None, length ≥ 16 → None."""
    return s.map(_set_housenumber, na_action="ignore")


@F.pandas_udf(T.StringType())
def clean_city_title_udf(s: pd.Series) -> pd.Series:
    """``clean_city(x.title())`` — hu_shell.py:72-76 titles the feed value
    BEFORE clean_city (whose case-sensitive typo replacements see the
    titled form). Python ``str.title()`` capitalizes after hyphens too,
    unlike Spark's initcap, so this stays a pandas UDF."""
    return pd.Series(
        [hu.clean_city(v.title()) if isinstance(v, str) else None for v in s],
        dtype="object",
    )


@F.pandas_udf(T.StringType())
def replace_html_newlines_udf(s: pd.Series) -> pd.Series:
    """F11: ``replace_html_newlines`` over an already-clean_string'd
    column. NULL input stays NULL — mirroring the caller-side drop the
    reference takes when it feeds None (hu_mkb_bank.py:91 raises in
    ``reduce`` on a None text); the drop itself is the provider's filter."""
    return s.map(hu.replace_html_newlines, na_action="ignore")


@F.pandas_udf(T.StringType())
def title_udf(s: pd.Series) -> pd.Series:
    """Python ``str.title()`` (capitalizes after hyphens/apostrophes —
    NOT Spark's initcap). hu_dm.py:71-73 titles the street substring
    before extraction."""
    return pd.Series(
        [v.title() if isinstance(v, str) else None for v in s], dtype="object"
    )


@F.pandas_udf(_ADDR_STRUCT)
def extract_all_address_udf(s: pd.Series) -> pd.DataFrame:
    """F3: the regex (non-waxeye) full-address split
    (``extract_all_address``, address.py:291-312)."""
    rows = [hu.extract_all_address(v) for v in s]
    return pd.DataFrame(
        rows,
        columns=["postcode", "city", "street", "housenumber", "conscriptionnumber"],
    )


_CITY_ADDR_STRUCT = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("housenumber", T.StringType()),
        T.StructField("conscriptionnumber", T.StringType()),
    ]
)


@F.pandas_udf(_CITY_ADDR_STRUCT)
def extract_city_address_udf(s: pd.Series) -> pd.DataFrame:
    """F2 family: 'City, street hn' 4-way split
    (``extract_city_street_housenumber_address``, address.py:359-377)."""
    rows = [hu.extract_city_street_housenumber_address(v)[:4] for v in s]
    return pd.DataFrame(
        rows, columns=["city", "street", "housenumber", "conscriptionnumber"]
    )

"""Randomized-corpus equivalence checks for the provider layer's pure
column-expression reimplementations of reference scalar functions.

Pattern follows test_osm_misc's integer-sanitation corpus: a seeded
random corpus + hand-picked edge cases, evaluated in ONE Spark round
trip, compared element-wise against the Python reference semantics
(functions/hu_address.py, itself pinned by reference goldens)."""

import random

import pyspark.sql.functions as F

from osm_poi_matchmaker_spark.functions.hu_address import clean_opening_hours


def test_clean_opening_hours_expr_randomized(spark):
    """_clean_opening_hours_expr (providers.py, used by foxpost) must
    equal address.py:540-555 semantics for arbitrary junk: regex search,
    whitespace strip, dash split, zfill(5) without truncation."""
    from osm_poi_matchmaker_spark.sources.providers import _clean_opening_hours_expr

    rng = random.Random(20260818)
    alphabet = "0123456789::  --abz\t"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(600)
    ] + [
        "8:00-20:00", "08:00 - 20:00", "006:30-18:000", "0:0-0:0",
        "nyitva 0-24", "9:15 -  17:45 szombaton", "12:34", "", None,
        "001:2-3:004", "  10:00-11:00  ",
    ]
    # guard: both branches exercised
    hits = sum(
        clean_opening_hours(c)[0] is not None for c in cases if c is not None
    )
    assert 5 < hits < len(cases) - 5, hits

    src = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, raw string"
    )
    o, c_ = _clean_opening_hours_expr(F.col("raw"))
    got = {
        r["i"]: (r["o"], r["c"])
        for r in src.select("i", o.alias("o"), c_.alias("c")).collect()
    }
    for i, case in enumerate(cases):
        expected = (None, None) if case is None else clean_opening_hours(case)
        assert got[i] == expected, (case, got[i], expected)


def test_shell_street_expr_randomized(spark):
    """_shell_street_expr must equal hu_shell.py:67-70:
    lower().split() + capitalize all but the last two tokens + join."""
    from osm_poi_matchmaker_spark.sources.providers import _shell_street_expr

    def ref(addr):
        toks = addr.lower().split()
        for i in range(0, len(toks) - 2):
            toks[i] = toks[i].capitalize()
        return " ".join(toks)

    rng = random.Random(20260819)
    words = ["FŐ", "ÚT", "1.", "m1", "AUTÓPÁLYA", "kis", "KŐRÖSI", "42",
             "Bajcsy-Zsilinszky", "útja", ""]
    cases = [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 6)))
        for _ in range(300)
    ] + ["KISKŐRÖSI ÚT 4.", "BUDAPESTI  ÚT 154.", "M1 AUTÓPÁLYA", "", "  ",
         "\tEGY\tKÉT\tHÁROM\t"]

    src = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, raw string"
    )
    got = {
        r["i"]: r["s"]
        for r in src.select(
            "i", _shell_street_expr(F.col("raw")).alias("s")
        ).collect()
    }
    for i, case in enumerate(cases):
        assert got[i] == ref(case), (repr(case), got[i], ref(case))


def test_expr_cleaners_match_python_twins(spark):
    """clean_postcode/url/email_udf are now pure column expressions —
    they must agree with the Python parity functions byte-for-byte over
    a randomized + adversarial corpus (whitespace runs, NULL sentinels,
    '-/, ' trims, '0' postcode, '//' runs, comma/space email lists)."""
    import random

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.functions import hu_address as hu
    from osm_poi_matchmaker_spark.functions.spark_udfs import (
        clean_email_udf,
        clean_postcode_udf,
        clean_string_expr,
        clean_url_udf,
    )

    rng = random.Random(20260819)
    atoms = ["1066", "0", "none", "NULL", "NaN", "a@b.hu", "x@y.z,w@q.hu",
             "http://ex.com//a//b", "https://EX.com/", "  ", "\t", " ",
             "-", "/", ",", "Bp.", "9021", "űő", ""]
    cases = [
        "".join(rng.choice(atoms) for _ in range(rng.randint(0, 5)))
        for _ in range(400)
    ] + ["0", " 0 ", "-0-", "NONE", "nullnone", "a b,c", "http://a///b",
         "ftp://x//y", ":///", None]

    src = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, raw string"
    )
    got = {
        r["i"]: (r["s"], r["p"], r["u"], r["e"])
        for r in src.select(
            "i",
            clean_string_expr(F.col("raw")).alias("s"),
            clean_postcode_udf(F.col("raw")).alias("p"),
            clean_url_udf(F.col("raw")).alias("u"),
            clean_email_udf(F.col("raw")).alias("e"),
        ).collect()
    }
    for i, case in enumerate(cases):
        want = (hu.clean_string(case), hu.clean_postcode(case),
                hu.clean_url(case), hu.clean_email(case))
        assert got[i] == want, (repr(case), got[i], want)

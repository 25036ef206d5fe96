# -*- coding: utf-8 -*-
"""Goldens for relationer / smart_postcode_check / url_tag_generator /
compare_strings — ported from /root/reference/test/test_osm.py,
test_online_poi_matching.py, test_file_output_helper.py."""

from __future__ import annotations

import pytest

from osm_poi_matchmaker_spark.functions.osm_misc import (
    compare_strings,
    relationer,
    smart_postcode_check,
    url_tag_generator,
)


def test_relationer_ways():
    assert relationer(["w25291279", "outer", "w25291280", "inner"]) == [
        {"type": "way", "ref": "25291279", "role": "outer"},
        {"type": "way", "ref": "25291280", "role": "inner"},
    ]


def test_relationer_relations():
    assert relationer(["r555643", "", "r555642", ""]) == [
        {"type": "relation", "ref": "555643", "role": ""},
        {"type": "relation", "ref": "555642", "role": ""},
    ]


def test_relationer_none():
    assert relationer(None) is None


# (poi_postcode, osm_postcode, queried_postcode, expected) — 14 reference cases
POSTCODE_CASES = [
    ("9737", "9737", "9737", "9737"),
    ("9737", "9737", "9739", "9737"),
    ("9737", "9737", "9740", "9737"),
    ("9737", "9737", "9741", "9737"),
    ("9737", "9738", "9737", "9738"),
    ("9737", "9738", "9742", "9738"),
    ("9737", "9738", "9750", "9738"),
    ("1029", "1028", "1029", "1028"),
    ("1029", "1028", "1040", "1028"),
    ("1029", "1029", "1030", "1029"),
    ("1028", "1028", "1029", "1028"),
    ("5662", "5662", "5555", "5662"),
    ("1036", "1032", "1037", "1032"),
    ("1024", "0", "0", "1024"),
]


@pytest.mark.parametrize("poi_pc,osm_pc,query_pc,expected", POSTCODE_CASES)
def test_smart_postcode_check(poi_pc, osm_pc, query_pc, expected):
    got = smart_postcode_check({"postcode": poi_pc}, {"postcode": osm_pc}, query_pc)
    assert got == expected


URL_CASES = [
    ("https://www.mkb.hu", "", "https://www.mkb.hu"),
    ("https://www.mkb.hu", None, "https://www.mkb.hu"),
    ("", "", None),
    (None, "", None),
    ("", None, None),
    (None, None, None),
    ("https://www.mkb.hu", "https://lny.io/MKB-WEB-HEREND", "https://lny.io/mkb-web-herend"),
]


@pytest.mark.parametrize("base,website,expected", URL_CASES)
def test_url_tag_generator(base, website, expected):
    assert url_tag_generator(base, website) == expected


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (None, "x", " NEW "),
        ("", "x", " NEW "),
        ("x", None, " DEL "),
        ("x", "", " DEL "),
        ("x", "y", " MOD "),
        ("x", "x", " EQU "),
        (None, None, " EQU "),
    ],
)
def test_compare_strings(a, b, expected):
    assert compare_strings(a, b) == expected


def test_clean_integer_expr_random_corpus(spark):
    """F21 property check: the column expression agrees with a direct
    transcription of clean_integer_fields (data_handlers.py:41-108) on a
    1000-string randomized corpus (seeded — deterministic), batched
    through ONE Spark job."""
    import random

    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.functions.spark_udfs import clean_integer_expr

    def ref_clean(value):
        if value is None:
            return None
        if value.strip() == "":
            return None
        if value.replace(".", "", 1).isdigit():
            return int(float(value))
        return None

    rng = random.Random(20260818)
    alphabet = "0123456789..  -+eEabz"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 10)))
        for _ in range(995)
    ] + ["725.0", ".5", "-5", "1e3", None]
    # guard: the corpus must exercise both accept and reject branches
    accepted = sum(ref_clean(c) is not None for c in cases if c is not None)
    assert 20 < accepted < 900, accepted

    src = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], ["i", "raw"]
    )
    got = {
        r["i"]: r["cleaned"]
        for r in src.select("i", clean_integer_expr(F.col("raw")).alias("cleaned")).collect()
    }
    for i, c in enumerate(cases):
        exp = ref_clean(c)
        assert got[i] == exp, (repr(c), got[i], exp)

# -*- coding: utf-8 -*-
"""Golden tests for the from-scratch structured HU address parser (F4).

The 55-case fixture was captured behaviorally from the reference's
waxeye-generated parser at the wrapper level
(libs/address.py:315-356 `extract_all_address_waxeye`) — the reference's
own unittest for this path is broken (test/test_address.py:115-133 indexes
fixture keys that don't exist), so this table is the executable parity
evidence.
"""

from __future__ import annotations

import json
import os

import pytest

from osm_poi_matchmaker_spark.functions.hu_address_peg import (
    extract_all_address_waxeye,
    parse_hu_address,
)

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "waxeye_goldens.json")

with open(_FIXTURE) as _f:
    GOLDENS = json.load(_f)


@pytest.mark.parametrize(
    "original,expected",
    [(g["original"], tuple(g["expected"])) for g in GOLDENS],
    ids=[repr(g["original"])[:40] for g in GOLDENS],
)
def test_waxeye_parity(original, expected):
    assert parse_hu_address(original) == expected


def test_alias_is_same_function():
    assert extract_all_address_waxeye is parse_hu_address


def test_never_raises_on_junk():
    for junk in ["", None, "????", "12", "(((", "1234", "a,b,c,d", "１２３", "\x00"]:
        out = parse_hu_address(junk)
        assert isinstance(out, tuple) and len(out) == 5

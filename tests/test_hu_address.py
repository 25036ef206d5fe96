# -*- coding: utf-8 -*-
"""Golden tests for the Hungarian normalization layer.

Expected values ported verbatim from the reference suite
(/root/reference/test/test_address.py) — they pin the per-row invariants
(BASELINE.json: byte-identical extracted values per input)."""

from __future__ import annotations

import pytest

from osm_poi_matchmaker_spark.functions.hu_address import (
    clean_city,
    clean_opening_hours,
    clean_opening_hours_2,
    clean_phone,
    clean_phone_and_mobile_to_str,
    clean_phone_to_str,
    clean_postcode,
    clean_string,
    clean_url,
    extract_phone_number,
    extract_street_housenumber_better_2,
    replace_html_newlines,
)

STREET_CASES = [
    ("Gránátos u. 11.", "Gránátos utca", "11", None),
    ("BERCSÉNYI U.1 2934/5 HRSZ", "Bercsényi Miklós utca", "1", "2934/5"),
    ("Szérűskert utca 018910/23. hrsz. (Köles utca 1.)", "Szérűskert utca", None, "018910/23"),
    ("Palotai út 6. (Fehér Palota Üzletközpont)", "Palotai út", "6", None),
    ("Budai Vám 1.", "Budai Vám", "1", None),
    ("Kaszás u. 2.-Dózsa György út 87.", "Dózsa György út", "87", None),
    ("Bajcsy Zs. út 11.", "Bajcsy-Zsilinszky út", "11", None),
    ("Hunyadi János út 19. - Savoya Park", "Hunyadi János út", "19", None),
    ("Kölcsey F. utca 1.", "Kölcsey Ferenc utca", "1", None),
    ("Várkerület 41.", None, None, None),
    ("Bajcsy-Zs. E. u. 31.", "Bajcsy-Zsilinszky Endre utca", "31", None),
    ("Bajcsy Zs.u. 77.", "Bajcsy-Zsilinszky utca", "77", None),
    ("Dózsa Gy.u.6.", "Dózsa György utca", "6", None),
    ("Krisztina krt. 65-67.", "Krisztina körút", "65-67", None),
    ("OLADI LTP. (DOLGOZÓK U.)", "OLADI lakótelep", None, None),
    ("Fő út 24.", "Fő út", "24", None),
    ("Törvényház u. 4.", "Törvényház utca", "4", None),
    ("Alkotás u. 53.", "Alkotás utca", "53", None),
    ("Szilas pihenő M3", "Szilas pihenő", "3", None),
    ("Üllői út 129", "Üllői út", "129", None),
]


@pytest.mark.parametrize("original,street,hn,csn", STREET_CASES)
def test_extract_street_housenumber(original, street, hn, csn):
    got_street, got_hn, got_csn = extract_street_housenumber_better_2(original)
    assert got_street == street
    assert got_hn == hn
    assert got_csn == csn


OPENING_RANGE_CASES = [
    ("05:20-19:38", "05:20", "19:38"),
    ("6:44-21:00", "06:44", "21:00"),
    ("05:20-19:38 Reggel nyolctól bejárat az üzleten át", "05:20", "19:38"),
    ("   7:41 - 22:30    ", "07:41", "22:30"),
    ("  05:30  -  23:00 ", "05:30", "23:00"),
    ("  -       ", None, None),
]


@pytest.mark.parametrize("original,open_,close", OPENING_RANGE_CASES)
def test_clean_opening_hours(original, open_, close):
    assert clean_opening_hours(original) == (open_, close)


@pytest.mark.parametrize(
    "original,expected",
    [("600", "06:00"), ("0644", "06:44"), ("2359", "23:59"), ("-1", None)],
)
def test_clean_opening_hours_2(original, expected):
    assert clean_opening_hours_2(original) == expected


PHONE_CASES = [
    ("0684/330-734, 0630/2374-712", ["+36 84 330 734", "+36 30 237 4712"]),
    ("06-20-200-4000", ["+36 20 200 4000"]),
    ("62464024", ["+36 62 464 024"]),
    (" 3684330 - 734", ["+36 84 330 734"]),
    (
        "06205089009(Központi Telszám: Benzinkút, Motel, Kávézó, Szobafoglalás)",
        ["+36 20 508 9009"],
    ),
    ("  ", None),
    ("+36 20 2976 393", ["+36 20 297 6393"]),
]


@pytest.mark.parametrize("original,expected", PHONE_CASES)
def test_clean_phone(original, expected):
    assert clean_phone(original) == expected


PHONE_STR_CASES = [
    ("0684/330-734, 0630/2374-712", "+36 84 330 734;+36 30 237 4712"),
    ("06-20-200-4000", "+36 20 200 4000"),
    ("62464024", "+36 62 464 024"),
    (" 3684330 - 734", "+36 84 330 734"),
    (
        "06205089009(Központi Telszám: Benzinkút, Motel, Kávézó, Szobafoglalás)",
        "+36 20 508 9009",
    ),
    ("  ", None),
    ("+36303035698", "+36 30 303 5698"),
]


@pytest.mark.parametrize("original,expected", PHONE_STR_CASES)
def test_clean_phone_to_str(original, expected):
    assert clean_phone_to_str(original) == expected


PHONE_MOBILE_CASES = [
    ("0684/330-734, 0630/2374-712", "+36 84 330 734", "+36 30 237 4712"),
    ("06-20-200-4000", None, "+36 20 200 4000"),
    ("62464024", "+36 62 464 024", None),
    (" 3684330 - 734", "+36 84 330 734", None),
    (
        "06205089009(Központi Telszám: Benzinkút, Motel, Kávézó, Szobafoglalás)",
        None,
        "+36 20 508 9009",
    ),
    ("  ", None, None),
    ("+36303035698", None, "+36 30 303 5698"),
]


@pytest.mark.parametrize("original,phone,mobile", PHONE_MOBILE_CASES)
def test_clean_phone_and_mobile(original, phone, mobile):
    assert clean_phone_and_mobile_to_str(original) == (phone, mobile)


STRING_CASES = [
    ("  ablak  zsiráf   ", "ablak zsiráf"),
    (None, None),
    ("    ", None),
    ("None", None),
    ("   None   ", None),
    (" NULL", None),
    (" NULLNone", None),
    (" \n\nNULLNone", None),
    ("\n", None),
    ("\t", None),
]


@pytest.mark.parametrize("original,expected", STRING_CASES)
def test_clean_string(original, expected):
    assert clean_string(original) == expected


@pytest.mark.parametrize(
    "original,expected",
    [
        # NOTE: the reference's test file expects a trailing '/' here, but
        # the reference CODE (clean_string strips '-/, ' → drops trailing
        # slashes, address.py:700) returns the value below — verified by
        # executing the reference implementation. We pin to code behavior.
        ("  https://examle.com//tests//url//   ", "https://examle.com/tests/url"),
        ("  https://examle.com/////tests///url     ", "https://examle.com/tests/url"),
    ],
)
def test_clean_url(original, expected):
    assert clean_url(original) == expected


CITY_CASES = [
    ("Bük", "Bük"),
    ("Csanádapáca", "Csanádapáca"),
    ("Tordas", "Tordas"),
    ("Szentendre", "Szentendre"),
    ("Budapest I. Kerület", "Budapest"),
    ("Budapest Xxiii. Kerület", "Budapest"),
    ("Mikolc", "Miskolc"),
    ("Iinárcs", "Inárcs"),
]


@pytest.mark.parametrize("original,expected", CITY_CASES)
def test_clean_city(original, expected):
    assert clean_city(original) == expected


POSTCODE_CASES = [
    ("1111", "1111"),
    ("    1111     ", "1111"),
    ("    1111", "1111"),
    ("1111    ", "1111"),
    ("", None),
    (" ", None),
    ("0", None),
    ("None", None),
]


@pytest.mark.parametrize("original,expected", POSTCODE_CASES)
def test_clean_postcode(original, expected):
    assert clean_postcode(original) == expected


HTML_NEWLINE_CASES = [
    (
        "Akadálymentesen megközelíthető fiók és ATM  <br> Telefonszám:(26) 501-400 </br>",
        "Akadálymentesen megközelíthető fiók és ATM; Telefonszám:(26) 501-400;",
    ),
    (
        "Akadálymentesen megközelíthető fiók és ATM<br />A fiókban a Prémium szolgáltatás "
        "elérhető.  <br> Telefonszám:(22) 515-260 </br>",
        "Akadálymentesen megközelíthető fiók és ATM; A fiókban a Prémium szolgáltatás "
        "elérhető.; Telefonszám:(22) 515-260;",
    ),
]


@pytest.mark.parametrize("original,expected", HTML_NEWLINE_CASES)
def test_replace_html_newlines(original, expected):
    assert replace_html_newlines(original) == expected


EXTRACT_PHONE_CASES = [
    (
        "Akadálymentesen megközelíthető fiók és ATM  <br> Telefonszám:(26) 501-400 </br>",
        "+36 26 501 400",
    ),
    (
        "Akadálymentesen megközelíthető fiók és ATM<br />A fiókban a Prémium szolgáltatás "
        "elérhető.  <br> Telefonszám:(22) 515-260 </br>",
        "+36 22 515 260",
    ),
    (
        "Pláza, földszint, Búza tér felőli bejárat<br />Akadálymentesen megközelíthető fiók "
        "és ATM  <br> Telefonszám:(46) 504-540 </br>",
        "+36 46 504 540",
    ),
]


@pytest.mark.parametrize("original,expected", EXTRACT_PHONE_CASES)
def test_extract_phone_number(original, expected):
    assert extract_phone_number(original) == expected


# ---------------------------------------------------------------------------
# Extended goldens (reference test/test_address_extended.py)
# ---------------------------------------------------------------------------
from osm_poi_matchmaker_spark.functions.hu_address import (  # noqa: E402
    clean_branch,
    clean_email,
    clean_javascript_variable,
    clean_phone_to_json,
    clean_street,
    clean_street_type,
    extract_city_street_housenumber_address,
    extract_street_housenumber,
    remove_whitespace,
)
import json as _json  # noqa: E402


@pytest.mark.parametrize("value,rpl,expected", [
    ("hello world", "", "helloworld"),
    ("hello world", " ", "hello world"),
    ("hello\tworld", "", "helloworld"),
    ("hello\nworld", "-", "hello-world"),
    ("a  b  c", "", "abc"),
    ("a  b  c", " ", "a b c"),
    ("nospaces", "", "nospaces"),
    ("", "", ""),
])
def test_remove_whitespace(value, rpl, expected):
    assert remove_whitespace(value, rpl) == expected


@pytest.mark.parametrize("clearable,removable,expected", [
    ('var myData = {"key": "value"};', "myData", '{"key": "value"}'),
    ("  var  myData  =  [1,2,3] ;", "myData", "[1,2,3]"),
    ('var items = "hello";', "items", '"hello"'),
    ("var data = null", "data", "null"),
])
def test_clean_javascript_variable(clearable, removable, expected):
    assert clean_javascript_variable(clearable, removable) == expected


@pytest.mark.parametrize("original,expected", [
    (None, None),
    ("Bajcsy-Zsilinszky u. 3.", "Bajcsy-Zsilinszky utca 3."),
    ("Kossuth krt. 5.", "Kossuth körút 5."),
    ("Petőfi ltp. B épület", "Petőfi lakótelep B épület"),
    ("Bajcsy Zs.u. 7.", "Bajcsy-Zsilinszky utca 7."),
    ("Kossuth L. utca 1.", "Kossuth Lajos utca 1."),
])
def test_clean_street(original, expected):
    assert clean_street(original) == expected


@pytest.mark.parametrize("original,expected", [
    (None, None), ("", None), ("u.", "utca"), ("utca", "utca"),
    ("fkl. út", "főközlekedési út"), ("főút", "főközlekedési út"),
    ("ltp.", "lakótelep"), ("pu.", "pályaudvar"), ("út.", "út"),
])
def test_clean_street_type(original, expected):
    assert clean_street_type(original) == expected


@pytest.mark.parametrize("original,expected", [
    (None, None), ("", None), ("Fiók", "fiók"), ("Atm", "ATM"),
    ("Központi Fiók", "központi fiók"), ("Ügyfélszolgálat", "ügyfélszolgálat"),
    ("5. Sz. Fiók", "5. számú fiók"), ("Üzletház", "üzletház"),
    ("Bevásárlóközpont", "bevásárlóközpont"),
])
def test_clean_branch(original, expected):
    assert clean_branch(original) == expected


@pytest.mark.parametrize("original,expected", [
    (None, None), ("   ", None),
    ("test@example.com", "test@example.com"),
    ("TEST@EXAMPLE.COM", "test@example.com"),
    ("a@b.com;c@d.com", "a@b.com;c@d.com"),
])
def test_clean_email(original, expected):
    assert clean_email(original) == expected


@pytest.mark.parametrize("original,expected", [
    (None, None), ("  ", None),
    ("06-20-200-4000", _json.dumps(["+36 20 200 4000"])),
    ("0684/330-734", _json.dumps(["+36 84 330 734"])),
])
def test_clean_phone_to_json(original, expected):
    assert clean_phone_to_json(original) == expected


@pytest.mark.parametrize("original,street,hn", [
    ("Fő utca 1.", "Fő utca", "1"),
    ("Kossuth u. 3.", "Kossuth utca", "3"),
    ("Petőfi krt. 10.", "Petőfi körút", "10"),
    ("Rákóczi út 25/A", "Rákóczi út", "25/A"),
    ("Ady Endre utca 5/B", "Ady Endre utca", "5/B"),
])
def test_extract_street_housenumber_legacy(original, street, hn):
    got_street, got_hn = extract_street_housenumber(original)
    assert got_street == street
    assert got_hn == hn


@pytest.mark.parametrize("original,city,street,hn,csn", [
    (None, None, None, None, None),
    ("", None, None, None, None),
    ("Budapest, Fő utca 1.", "Budapest", "Fő utca", "1", None),
    ("Pécs", "Pécs", None, None, None),
])
def test_extract_city_street_housenumber(original, city, street, hn, csn):
    result = extract_city_street_housenumber_address(original)
    assert result[0] == city
    assert result[1] == street
    assert result[2] == hn
    assert result[3] == csn

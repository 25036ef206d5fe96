# -*- coding: utf-8 -*-
"""Prettify/canonicalization + text extraction unit tests (soup.py:113-125
semantics; format goldens for the bs4-prettify output shape)."""

from __future__ import annotations

from osm_poi_matchmaker_spark.extract.html import (
    extract_javascript_variable,
    html_to_text,
    prettify_html,
)


def test_prettify_simple_nesting():
    raw = b"<html><body><p>Hello</p></body></html>"
    assert prettify_html(raw) == (
        "<html>\n <body>\n  <p>\n   Hello\n  </p>\n </body>\n</html>\n"
    )


def test_prettify_attributes_and_void():
    raw = '<div class="x"><br><img src="a.png"></div>'
    assert prettify_html(raw) == (
        '<div class="x">\n <br/>\n <img src="a.png"/>\n</div>\n'
    )


def test_prettify_strips_interstitial_whitespace():
    raw = "<ul>\n  <li> a </li>\n  <li>b</li>\n</ul>"
    assert prettify_html(raw) == "<ul>\n <li>\n  a\n </li>\n <li>\n  b\n </li>\n</ul>\n"


def test_html_to_text_skips_script_style():
    raw = "<html><script>var x = 1;</script><style>p{}</style><p>keep me</p></html>"
    assert html_to_text(raw) == "keep me"


def test_html_to_text_joins_blocks():
    raw = "<div><p>one</p><p>two</p></div>"
    assert html_to_text(raw) == "one\ntwo"


def test_extract_javascript_variable():
    raw = (
        "<html><script>\n var stores = {\"a\": 1, \"b\": [2]};\n</script>"
        "<p>x</p></html>"
    )
    assert extract_javascript_variable(raw, "stores") == '{"a": 1, "b": [2]}'


def test_extract_javascript_variable_missing():
    assert extract_javascript_variable("<p>no scripts</p>", "stores") is None


def test_extract_javascript_variable_space_before_semicolon_quirk():
    # reference regex requires `};` / `];` with no gap — `} ;` → None
    # (libs/address.py:247 pattern, preserved verbatim)
    raw = "<script>var stores = {\"a\": 1} ;</script>"
    assert extract_javascript_variable(raw, "stores") is None


def test_extract_javascript_variable_stops_at_first_close():
    # payload ends at the FIRST `];` — later statements in the same
    # <script> are excluded
    raw = (
        "<script>\nvar boltok = [{\"id\": 1}];\nvar other = {\"x\": 2};\n"
        "</script>"
    )
    assert extract_javascript_variable(raw, "boltok") == '[{"id": 1}]'


def test_idempotent_prettify():
    raw = b"<html><body><p>Q</p></body></html>"
    once = prettify_html(raw)
    assert prettify_html(once) == once

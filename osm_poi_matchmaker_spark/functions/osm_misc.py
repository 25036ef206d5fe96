# -*- coding: utf-8 -*-
"""OSM-side scalar helpers: relation decoding, timestamps, diff labels,
URL-tag assembly, postcode preference logic.

Semantics pinned by the reference goldens (test/test_osm*.py,
test/test_online_poi_matching.py, test/test_file_output_helper.py);
sources: libs/osm.py:52-89, libs/compare_strings.py:14-26,
libs/file_output_helper.py:13-29, libs/online_poi_matching.py:402-465.
"""

from __future__ import annotations

from .hu_address import clean_postcode, clean_url

_MEMBER_TYPES = {"n": "node", "w": "way", "r": "relation"}


def relationer(members):
    """Flat ['w123', 'outer', ...] pair list → [{'type','ref','role'}, ...]."""
    if members is None:
        return None
    decoded = []
    for i in range(0, len(members) - 1, 2):
        ref_token, role = members[i], members[i + 1]
        decoded.append(
            {
                "type": _MEMBER_TYPES.get(ref_token[0], "unknown"),
                "ref": ref_token[1:],
                "role": role,
            }
        )
    return decoded


def compare_strings(a, b=""):
    """Field diff label: ' NEW ' / ' DEL ' / ' MOD ' / ' EQU '."""
    a_empty = a == "" or a is None
    b_empty = b == "" or b is None
    if a_empty and not b_empty:
        return " NEW "
    if not a_empty and b_empty:
        return " DEL "
    return " EQU " if str(a) == str(b) else " MOD "


def url_tag_generator(poi_url_base, poi_website):
    """Merge a brand base URL with a per-POI website field."""
    if not (isinstance(poi_url_base, str) and poi_url_base):
        return None
    if isinstance(poi_website, str) and poi_website:
        if poi_url_base in poi_website or "://" in poi_website:
            return clean_url(poi_website)
        return clean_url(f"{poi_url_base}/{poi_website}")
    return clean_url(poi_url_base)


def ordered_postcode_check(candidates):
    """First usable postcode of an ordered candidate list (None/'0'/0 skip)."""
    for pc in candidates:
        if pc is not None and pc != 0 and pc != "0":
            return str(pc)
    return None


_PC_SENTINELS = (0, "", "None", "NaN", None)


def smart_postcode_check(poi_addr: dict, osm_addr: dict, osm_query_postcode):
    """Postcode reconciliation (reference issue #78 semantics).

    ``poi_addr`` keys: postcode, city, street, housenumber,
    conscriptionnumber; ``osm_addr`` the matched OSM POI's addr:* values.
    Preference order: OSM POI's own postcode > PIP-queried postcode >
    provider postcode; '0'-ish results → None.
    """
    osm_db_postcode = osm_addr.get("postcode")
    if osm_db_postcode in _PC_SENTINELS:
        osm_db_postcode = None
    # (the reference counts changed addr fields only for logging — the
    # decision below is unconditional, online_poi_matching.py:443-448)
    postcode = ordered_postcode_check(
        [osm_db_postcode, osm_query_postcode, poi_addr.get("postcode")]
    )
    if postcode is None or postcode == "0" or postcode == 0:
        return None
    return postcode


def query_postcode_osm_external(
    prefer_osm, prefer_original, queried_postcode, postcode_ext, postcode_original
):
    """Postcode source-preference cascade (libs/osm.py:52-66) with the PIP
    lookup already resolved to ``queried_postcode`` (set-based join upstream
    instead of the reference's per-row SQL)."""
    if prefer_original is True and clean_postcode(postcode_original) is not None:
        return clean_postcode(postcode_original)
    if prefer_osm is False and clean_postcode(postcode_ext) is not None:
        return clean_postcode(postcode_ext)
    if prefer_osm is True:
        if clean_postcode(queried_postcode) is not None:
            return clean_postcode(queried_postcode)
        return clean_postcode(postcode_ext)
    return None

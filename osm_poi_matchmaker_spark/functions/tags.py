# -*- coding: utf-8 -*-
"""Tag-map merge & rewrite (F20 — ``libs/file_output.py:442-694``).

Merging order (rightmost wins): OSM live tags ∪ brand common tags ∪
per-POI overrides — expressed with ``map_concat``-style dict semantics.
Contact-tag normalization mirrors the reference:

- plain ``website/phone/email/facebook/instagram/youtube/pinterest/fax/
  mobile`` keys rewrite to ``contact:*`` UNLESS the contact:* form already
  exists (then the plain key is dropped);
- ``contact:email`` / ``contact:website`` values lowercased;
- optional addr-tag removal (``do_not_export_addr_tags`` brands).

Pure-dict scalar (unit-tested) + a pandas UDF for MapType columns — tag
maps are ragged, so this is pandas-UDF-tier work, not column exprs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTACT_REWRITE_KEYS = (
    "website", "phone", "email", "facebook", "instagram", "youtube",
    "pinterest", "fax", "mobile",
)
ADDR_TAG_KEYS = (
    "addr:postcode", "addr:city", "addr:street", "addr:housenumber",
    "addr:conscriptionnumber",
)


def merge_tags(
    live_tags: dict | None,
    common_tags: dict | None,
    override_tags: dict | None,
    drop_addr_tags: bool = False,
) -> dict:
    """Merge three tag layers and normalize contact keys."""
    tags: dict = {}
    for layer in (live_tags, common_tags, override_tags):
        if layer:
            tags.update({k: v for k, v in layer.items() if v is not None})
    for key in CONTACT_REWRITE_KEYS:
        if key in tags:
            contact_key = f"contact:{key}"
            if contact_key in tags:
                tags.pop(key, None)
            else:
                tags[contact_key] = tags.pop(key)
            if key in ("email", "website") and isinstance(tags.get(contact_key), str):
                tags[contact_key] = tags[contact_key].lower()
    if drop_addr_tags:
        for key in ADDR_TAG_KEYS:
            tags.pop(key, None)
    return tags


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def merge_tags_udf(
    live: pd.Series, common: pd.Series, override: pd.Series, drop_addr: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            merge_tags(lv, cm, ov, bool(da) if da is not None else False)
            for lv, cm, ov, da in zip(live, common, override, drop_addr)
        ],
        dtype="object",
    )


# F19 — complex-opening-hours heuristic (libs/file_output.py:84-101).
# The reference searches each pattern case-insensitively; two behavioral
# quirks are preserved: bare 'SH' matches any 'sh' substring, and the
# \d{1,2}-\d{1,2} day-range pattern also fires on ordinary time ranges
# like '08:00-17:00' (both verified against the reference implementation).
COMPLEX_OH_PATTERNS = (
    r"sunrise", r"sunset", r"by appointment", r"SH",
    r"\bJan\b", r"\bFeb\b", r"\bMar\b", r"\bApr\b", r"\bMay\b", r"\bJun\b",
    r"\bJul\b", r"\bAug\b", r"\bSep\b", r"\bOct\b", r"\bNov\b", r"\bDec\b",
    r"\b\d{1,2}-\d{1,2}\b", r"Winter", r"Summer",
)

COMPLEX_OH_RE = "(?i)" + "|".join(f"(?:{p})" for p in COMPLEX_OH_PATTERNS)


def is_complex_opening_hours(oh) -> "F.Column":
    """F19 as a single rlike column expression (JVM-side, codegen'd)."""
    col = F.col(oh) if isinstance(oh, str) else oh
    return col.rlike(COMPLEX_OH_RE)

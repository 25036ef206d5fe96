"""Row-identity hashing (F13 — reference ``data_handlers.py:881-885``).

poi_hash = sha512 over the lowercased, space-stripped concatenation of
(poi_code, postcode, city, street, housenumber, conscriptionnumber).
Pure column expression: ``sha2(…, 512)``. A sha256 twin exists because the
DuckDB oracle lacks sha512 — same construction, verifiable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _canon_key(*cols: Column) -> Column:
    joined = F.concat_ws("", *[F.coalesce(c.cast("string"), F.lit("")) for c in cols])
    return F.regexp_replace(F.lower(joined), " ", "")


def poi_hash(*cols: Column) -> Column:
    """Reference-parity sha512 identity hash."""
    return F.sha2(_canon_key(*cols), 512)


def poi_hash_256(*cols: Column) -> Column:
    """Oracle-checkable sha256 variant (identical canonicalization)."""
    return F.sha2(_canon_key(*cols), 256)

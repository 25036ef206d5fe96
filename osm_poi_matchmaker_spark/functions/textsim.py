"""String-similarity column functions — pg_trgm-style trigram similarity.

The reference's fuzzy road/city matching leans on PostgreSQL extensions:
``similarity()`` (pg_trgm), ``levenshtein``, ``dmetaphone``, ``soundex``
(``dao/poi_base.py:892-918``, ``dao/data_handlers.py:538-563``). Spark
ships levenshtein and soundex natively; trigram similarity is implemented
here as PURE column expressions (substring transform over a padded string
→ distinct trigram arrays → |∩| / |∪|) so it stays inside whole-stage
codegen — no UDF. Matches pg_trgm semantics: lowercase, two leading + one
trailing space padding, set (not multiset) trigrams.

dmetaphone has no portable equivalent here; the cascade skeleton accepts
extra predicate columns where a metaphone UDF would slot in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trigrams(s: Column) -> Column:
    """Distinct trigram array of a padded, lowercased string."""
    p = F.concat(F.lit("  "), F.lower(s), F.lit(" "))
    n = F.greatest(F.length(p) - F.lit(2), F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: p.substr(i, F.lit(3)))
    )


def trigram_similarity(a: Column, b: Column) -> Column:
    """pg_trgm ``similarity()``: |trigrams ∩| / |trigrams ∪| in [0,1]."""
    ta, tb = trigrams(a), trigrams(b)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# DuckDB mirrors (oracle side) — keep in sync with the expressions above.
TRIGRAMS_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(len(CONCAT('  ', lower({s}), ' ')) - 2, 0) + 1), "
    "i -> substr(CONCAT('  ', lower({s}), ' '), i, 3)))"
)


def trigram_similarity_sql(a: str, b: str) -> str:
    ta, tb = TRIGRAMS_SQL.format(s=a), TRIGRAMS_SQL.format(s=b)
    inter = f"len(list_intersect({ta}, {tb}))"
    union = f"len(list_distinct(list_concat({ta}, {tb})))"
    return (
        f"(CASE WHEN {union} > 0 THEN CAST({inter} AS DOUBLE) / CAST({union} AS DOUBLE) "
        "ELSE 0.0 END)"
    )

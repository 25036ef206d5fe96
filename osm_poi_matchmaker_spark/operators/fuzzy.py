"""Tiered fuzzy-matching cascades (J7 street / J8 city).

Reference J8 (``dao/data_handlers.py:503-586``) resolves a dirty
(city_name, postcode) pair against the city dimension in 5 per-row SQL
stages: exact(name, zip) → soundex+trgm+lev+zip → trgm+lev+zip →
trgm+lev → zip-only. Spark rebuild: ONE broadcast join of the (small)
dimension against all inputs, every tier evaluated as a boolean column,
winner = min (tier, distance, key) window — the same all-tiers-at-once
shape as the match cascade.

Tier predicates here use Levenshtein (built-in, engine-portable);
trigram/metaphone variants plug into the same skeleton via extra
predicate columns (Python implementations in functions/textsim.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fuzzy_city_match(
    inputs: DataFrame,
    city_dim: DataFrame,
    max_lev: int = 2,
    input_key: str = "page_id",
) -> DataFrame:
    """inputs(input_key, city, postcode) × broadcast city_dim(city_id,
    city_name, city_post_code) → best (tier, lev, city_id) per input.

    Tiers (mirroring the reference cascade, minus the pg-only soundex/
    trgm stage which collapses into the lev tier):
      1 exact name + exact zip
      2 lev(name) <= max_lev + exact zip
      3 lev(name) <= max_lev
      4 exact zip only
    Unmatched inputs are dropped (reference returns None → row skipped).
    """
    joined = inputs.crossJoin(F.broadcast(city_dim))
    lev = F.levenshtein(F.lower(F.col("city")), F.lower(F.col("city_name")))
    name_eq = F.lower(F.col("city")) == F.lower(F.col("city_name"))
    zip_eq = F.col("postcode") == F.col("city_post_code")
    tier = (
        F.when(name_eq & zip_eq, 1)
        .when((lev <= max_lev) & zip_eq, 2)
        .when(lev <= max_lev, 3)
        .when(zip_eq, 4)
    )
    w = Window.partitionBy(input_key).orderBy("tier", "lev", "city_id")
    return (
        joined.withColumn("tier", tier)
        .where(F.col("tier").isNotNull())
        .withColumn("lev", lev)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(input_key, "city_id", "city_name", "city_post_code", "tier", "lev")
    )

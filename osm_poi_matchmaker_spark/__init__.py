"""osm_poi_matchmaker_spark — a PySpark-native POI match-and-conflate engine.

Built from scratch with the query semantics of KAMI911/osm_poi_matchmaker
(reference at /root/reference), re-expressed as distributed DataFrame plans:

- geotag extraction over Common-Crawl-style ``pages`` tables (vectorized,
  no per-row Python in the hot path);
- an H3-res-9-like equal-angle tiling layer (cell ids + k-ring expansion)
  used as the spatial join key everywhere;
- the reference's 9-tier match cascade (``dao/poi_base.py:149-793``) as ONE
  cell-keyed candidate join + a priority/distance window — replacing a SQL
  round-trip per POI per tier with a single distributed plan;
- k-ring cell-expansion kNN, point-in-polygon lookups, fuzzy street/city
  cascades, dedup (exact/minhash/simhash/ngram-jaccard), embedding ANN;
- checkpointed multi-stage pipelines with per-partition lineage metrics.

Everything is stock DataFrame/SQL + Arrow pandas UDFs; no RDDs, no custom
Catalyst rules.
"""

__version__ = "0.1.0"

"""Deterministic sampling invariants (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF


def test_split_stable_across_partitioning(spark):
    from osm_poi_matchmaker_spark.operators.sampling import assign_split

    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in assign_split(d, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_split(d.repartition(13), "doc_id").collect()
    }
    assert a == b
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]


def test_stratified_sample_monotone_and_rate_independent(spark):
    from osm_poi_matchmaker_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    low = {r["doc_id"] for r in stratified_sample(d, {"en": 0.2}).collect()}
    high = {r["doc_id"] for r in stratified_sample(d, {"en": 0.6}).collect()}
    assert low < high  # raising a rate only ADDS rows
    # adding another group's rate never changes which en-rows are kept
    mixed = {
        r["doc_id"]
        for r in stratified_sample(d, {"en": 0.2, "de": 0.9}).collect()
        if r["lang"] == "en"
    }
    assert mixed == low


def test_sample_plan_is_narrow(spark):
    """The stratified sample must stay a scan+filter — no exchange."""
    from osm_poi_matchmaker_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        stratified_sample(d, {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_leakage_safe_split_component_coherent(spark):
    from osm_poi_matchmaker_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(20)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        # 0-1-2 one component (canonical 0); 5-6 another; rest singletons
        [(i, 0 if i in (0, 1, 2) else (5 if i in (5, 6) else i)) for i in range(20)],
        "doc_id long, canonical_id long",
    )
    rows = {r["doc_id"]: r for r in leakage_safe_split(docs, comp).collect()}
    assert len(rows) == 20
    assert rows[0]["split"] == rows[1]["split"] == rows[2]["split"]
    assert rows[5]["split"] == rows[6]["split"]
    # component split equals the canonical's plain assign_split bucket
    from osm_poi_matchmaker_spark.operators.sampling import hash_bucket  # noqa: F401

    b = (0 * 48271 % 2147483647) % 1000
    assert rows[0]["split"] == ("train" if b < 900 else "val" if b < 950 else "test")


def test_corpus_release_disposition_precedence(spark):
    from osm_poi_matchmaker_spark.operators.sampling import corpus_release

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    gate = spark.createDataFrame(
        [(0, "keep"), (1, "too_short"), (2, "repetitive"), (3, "keep"),
         (4, "keep"), (5, "high_perplexity")],
        "doc_id long, reason string",
    )
    kb = spark.createDataFrame(
        # 3 is a duplicate of 0; 5 is a duplicate too, but the gate wins
        [(0, 0, False), (1, 1, False), (2, 2, False), (3, 0, True),
         (4, 4, False), (5, 0, True)],
        "doc_id long, canonical_id long, is_duplicate boolean",
    )
    got = {r["doc_id"]: r["disposition"]
           for r in corpus_release(docs, gate, kb).collect()}
    assert got[1] == "gate:too_short"
    assert got[2] == "gate:repetitive"
    assert got[5] == "gate:high_perplexity"  # gate outranks duplicate
    assert got[3] == "duplicate"
    # survivors split by CANONICAL id -> 0 and (hypothetically) its
    # family share a split; 0 and 4 get their own buckets
    b0 = (0 * 48271 % 2147483647) % 1000
    assert got[0] == ("train" if b0 < 900 else "val" if b0 < 950 else "test")
    assert got[4] in ("train", "val", "test")


def test_quality_weighted_sample_rates_and_determinism(spark):
    """A group of all-max-quality docs keeps (nearly) everything, an
    all-garbage group keeps nothing, and the kept-set is a pure function
    of (doc_id, group rate) — repartitioning never changes it."""
    from pyspark.sql import functions as F

    from osm_poi_matchmaker_spark.operators.sampling import (
        quality_weighted_sample,
    )

    # 60 tokens, stopword ratio 7/15 ≈ 0.47 (within 0.01..0.6), no punct
    good = "the cat sat on a mat and the dog ran to the park for fun " * 4
    bad = "!!!!! ????? ;;;;;"  # 3 tokens (< 10), all punctuation
    rows = [(i, good, "clean.example") for i in range(200)]
    rows += [(1000 + i, bad, "spam.example") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = quality_weighted_sample(docs).toPandas()
    by = out.groupby("source")
    # clean source: ok3 == 3 for every doc -> rate_ppm == 1_000_000 -> all kept
    clean = out[out.source == "clean.example"]
    assert (clean.rate_ppm == 1_000_000).all() and clean.kept.all()
    # spam source: ok3 == 0 -> rate 0 -> none kept
    spam = out[out.source == "spam.example"]
    assert (spam.rate_ppm == 0).all() and (~spam.kept).all()

    # determinism across partitioning
    out2 = quality_weighted_sample(docs.repartition(13, "text")).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

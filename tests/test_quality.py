"""operators/quality unit tests: hand-computed repetition signals,
boilerplate top-k semantics (tie-break + broadcast plan), PII masking.
The oracle-parity sweep pins the same ops corpus-wide; these pin the
arithmetic on adversarial fixtures."""

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.quality import (
    boilerplate_ngrams,
    pii_redact,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_computed(spark):
    # "a b a b a": 5 tokens, 2 distinct -> dup_token 3/5; top token 'a' 3/5;
    # 2-grams [a b, b a, a b, b a]: 4 with 2 distinct -> dup2 0.5
    got = repetition_stats(_docs(spark, [(1, "a b a b a")])).collect()[0]
    assert got["n_tokens"] == 5
    assert got["dup_token_frac"] == 0.6
    assert got["top_token_frac"] == 0.6
    assert got["dup_2gram_frac"] == 0.5
    assert bool(got["is_repetitive"]) is True


def test_repetition_stats_all_unique_and_short(spark):
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(spark, [(1, "w x y z"), (2, "solo"), (3, "")])
        ).collect()
    }
    assert rows[1]["dup_token_frac"] == 0.0
    assert rows[1]["top_token_frac"] == 0.25
    assert rows[1]["dup_2gram_frac"] == 0.0
    assert bool(rows[1]["is_repetitive"]) is True  # top_token 0.25 > 0.10
    assert rows[2]["n_tokens"] == 1 and rows[2]["dup_2gram_frac"] == 0.0
    # empty text: zero tokens, all fractions 0, not flagged
    assert rows[3]["n_tokens"] == 0 and bool(rows[3]["is_repetitive"]) is False


def test_boilerplate_topk_and_fractions(spark):
    # 3-gram 'nav nav nav' appears in docs 1-3 (df=3); doc 4 shares nothing.
    docs = _docs(
        spark,
        [
            (1, "nav nav nav p q r"),
            (2, "nav nav nav s t u"),
            (3, "nav nav nav"),
            (4, "x y z w"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_ngrams(docs, top_k=1).collect()}
    # top-1 by (df desc, shingle asc) is 'nav nav nav'
    assert out[3]["boiler_frac"] == 1.0 and bool(out[3]["is_boilerplate"]) is True
    assert out[1]["n_shingles"] == 4 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_frac"] == 0.25 and bool(out[1]["is_boilerplate"]) is False
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_frac"] == 0.0


def test_boilerplate_tie_break_is_shingle_ascending(spark):
    # both shingles have df=1; top_k=1 must pick the lexicographically
    # smaller one on every engine/partitioning
    docs = _docs(spark, [(1, "b b b"), (2, "a a a")])
    out = {r["doc_id"]: r for r in boilerplate_ngrams(docs, top_k=1).collect()}
    assert out[2]["n_boiler"] == 1 and out[1]["n_boiler"] == 0


def test_boilerplate_plan_broadcasts_topk(spark):
    docs = _docs(spark, [(i, "nav nav nav") for i in range(20)])
    plan = boilerplate_ngrams(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pii_redact_masks_and_counts(spark):
    out = {r["doc_id"]: r for r in pii_redact(_docs(spark, [(3, "hello"), (4, "hi")])).collect()}
    # doc 3: blurb email + the %3==0 cc email; doc 4: blurb email only
    assert out[3]["n_emails"] == 2 and out[4]["n_emails"] == 1
    assert out[3]["n_phones"] == 1 and out[4]["n_phones"] == 1
    assert out[4]["redacted"] == "hi Contact: [EMAIL] or call [PHONE]."
    assert out[3]["redacted"] == "hello Contact: [EMAIL] or call [PHONE]. cc [EMAIL]"
    assert "@" not in out[3]["redacted"] and "+36" not in out[3]["redacted"]

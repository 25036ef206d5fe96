"""BPE induction pinned EXACTLY against an independent pure-Python
Sennrich implementation (learn + tokenize) — stronger than a SQL oracle
for an inherently iterative op — plus closed-form merge-fold cases."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.operators.bpe import (
    END,
    apply_bpe,
    learn_bpe,
    tokenize_word,
)
from tests.conftest import SF_SMALL as SF


# --- independent reference (Sennrich ACL'16, algorithm 1) ------------
def _ref_learn(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        # max count, then lexicographic smallest (left, right)
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], stats[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _word_counts(rows):
    c = collections.Counter()
    for t in rows:
        for w in t.lower().split():
            if w:
                c[w] += 1
    return dict(c)


def test_learn_matches_reference_on_sennrich_corpus(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    docs = spark.createDataFrame(
        [(i, (w + " ") * n) for i, (w, n) in enumerate(wc.items())],
        ["doc_id", "text"],
    )
    got, _ = learn_bpe(docs, n_merges=10)
    assert got == _ref_learn(wc, 10)
    # the famous first merges: (e,s) 9, (es,t) 9, (est,</w>) 9 ...
    assert got[0][:2] == ("e", "s") and got[0][2] == 9


def test_learn_and_apply_match_reference_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    rows = [r["text"] for r in docs.collect()]
    wc = _word_counts(rows)

    merges, _ = learn_bpe(docs, n_merges=12)
    assert merges == _ref_learn(wc, 12)

    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe(docs, merges).collect()
    }
    pairs = [(l, r) for l, r, _ in merges]
    for r in docs.collect():
        want = []
        for w in r["text"].lower().split():
            if w:
                want.extend(tokenize_word(w, pairs))
        assert toks[r["doc_id"]] == want, r["doc_id"]


def test_merge_fold_greedy_cases(spark):
    # the adversarial shapes for left-to-right non-overlapping greedy
    cases = [
        ("aaa", ("a", "a"), ["aa", "a", END]),
        ("aaaa", ("a", "a"), ["aa", "aa", END]),
        ("abab", ("a", "b"), ["ab", "ab", END]),
        ("aab", ("a", "b"), ["a", "ab", END]),
    ]
    docs = spark.createDataFrame(
        [(i, w) for i, (w, _, _) in enumerate(cases)], ["doc_id", "text"]
    )
    for i, (w, (l, r), want) in enumerate(cases):
        assert tokenize_word(w, [(l, r)]) == want
        got = apply_bpe(docs.where(F.col("doc_id") == i), [(l, r)]).collect()
        assert list(got[0]["tokens"]) == want


def test_pinned_oracle_resource_matches_regeneration():
    """Drift guard for the pinned-golden BPE oracle (VERDICT r3 ask #1):
    regenerate the pins from the independent pure-Python Sennrich
    implementation in tools/gen_bpe_oracle.py and compare with the
    committed resource. If the driver testdata ever changes, this fails
    with the fix ('python tools/gen_bpe_oracle.py') instead of letting
    the VALUES oracle silently mismatch (signature keying already makes
    a stale pin yield zero oracle rows, not a false green)."""
    import json
    import pathlib
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.gen_bpe_oracle import OUT, pin

    committed = json.loads(pathlib.Path(OUT).read_text())
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        key = pathlib.Path(sf_dir).name
        assert committed[key] == pin(sf_dir), (
            f"{key}: pinned BPE oracle is stale — run python tools/gen_bpe_oracle.py"
        )

"""DuckDB oracle SQL for the document / embedding operators.

Mirrors operators/dedup.py, functions/textstats.py, operators/similarity.py
expression-by-expression. Notes on portability quirks:

- DuckDB ``regexp_replace`` needs the ``'g'`` flag (Spark's is global).
- DuckDB lambda index params are 1-based (Spark's ``transform`` index is
  0-based) — the SRP weight formula compensates.
- ``list_sum``/``F.aggregate`` both fold in element order → identical
  doubles; outputs are still rounded to 6 dp at the edge.
"""

from __future__ import annotations

from .functions.textstats import STOPWORDS_EN, STOPWORDS_HU

_TOKS = "list_filter(regexp_split_to_array({t}, '\\s+'), x -> x <> '')"
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)


def _in_list(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def dedup_exact_sql() -> str:
    return """
WITH d AS (SELECT doc_id, md5(text) AS text_hash FROM documents)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY text_hash) AS canonical_id,
       COUNT(*) OVER (PARTITION BY text_hash) AS group_size,
       doc_id <> MIN(doc_id) OVER (PARTITION BY text_hash) AS is_duplicate
FROM d"""


def _shingle_ctes() -> str:
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM s)"""


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {_shingle_ctes()},
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS common
  FROM e a JOIN e b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b,
       ROUND(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM pr
WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= {threshold}"""


def minhash_lsh_sql(num_perm: int = 8, bands: int = 4) -> str:
    rpb = num_perm // bands
    return f"""
WITH {_shingle_ctes()},
pp AS (SELECT doc_id, shingle, unnest(range(0, {num_perm})) AS perm FROM e),
sig AS (SELECT doc_id, perm,
               MIN(md5(CONCAT(CAST(perm AS STRING), '|', shingle))) AS minhash
        FROM pp GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(perm // {rpb} AS BIGINT) AS band,
              array_to_string(list_sort(list(minhash)), ',') AS band_sig
       FROM sig GROUP BY 1, 2)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bs a JOIN bs b ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id < b.doc_id"""


def simhash_sql() -> str:
    return """
WITH tk AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents),
hb AS (SELECT doc_id, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h,
              unnest(range(0, 60)) AS bit
       FROM tk),
v AS (SELECT doc_id, bit,
             CAST(SUM((h >> bit) & 1) * 2 > COUNT(*) AS BIGINT) AS bitval
      FROM hb GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(bitval << bit) AS BIGINT) AS simhash FROM v GROUP BY 1"""


def doc_stats_sql() -> str:
    toks = _TOKS.format(t="text")
    ltoks = _TOKS.format(t="lower(text)")
    sw_en = f"len(list_filter({ltoks}, t -> t IN {_in_list(STOPWORDS_EN)}))"
    sw_hu = f"len(list_filter({ltoks}, t -> t IN {_in_list(STOPWORDS_HU)}))"
    n = f"len({toks})"
    sw_ratio = f"(CASE WHEN {n} > 0 THEN CAST({sw_en} AS DOUBLE) / CAST({n} AS DOUBLE) ELSE 0.0 END)"
    punct = "length(regexp_replace(text, '[^.,;:!?]', '', 'g'))"
    pr_ratio = f"(CASE WHEN length(text) > 0 THEN CAST({punct} AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END)"
    tok_len_sum = f"list_sum(list_transform({toks}, t -> length(t)))"
    mean_tok = f"(CASE WHEN {n} > 0 THEN CAST({tok_len_sum} AS DOUBLE) / CAST({n} AS DOUBLE) ELSE 0.0 END)"
    quality = (
        f"((CASE WHEN {n} >= 10 AND {n} <= 5000 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN {sw_ratio} >= 0.01 AND {sw_ratio} <= 0.6 THEN 1.0 ELSE 0.0 END)"
        f" + (CASE WHEN {pr_ratio} <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0"
    )
    lang = (
        f"(CASE WHEN {sw_en} = 0 AND {sw_hu} = 0 THEN 'und' "
        f"WHEN {sw_en} >= {sw_hu} THEN 'en' ELSE 'hu' END)"
    )
    return f"""
SELECT doc_id,
       {n} AS n_tokens,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+|\\s+'
       )) AS n_bpe_tokens,
       length(text) AS n_chars_measured,
       ROUND({sw_ratio}, 6) AS stopword_ratio,
       ROUND({pr_ratio}, 6) AS punct_ratio,
       ROUND({mean_tok}, 6) AS mean_token_len,
       ROUND({quality}, 6) AS quality,
       {lang} AS lang_guess,
       md5(array_to_string({ltoks}, ' ')) AS fingerprint
FROM documents"""


def rolling_fingerprint_sql() -> str:
    ltoks = _TOKS.format(t="lower(text)")
    vals = (
        f"list_transform({ltoks}, t -> CAST(ascii(t) * 131 + length(t) * 7"
        " + ascii(substr(t, -1, 1)) AS BIGINT))"
    )
    return (
        "SELECT doc_id, list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), {vals}), "
        "(acc, v) -> (acc * 1000003 + v) % 2147483647) AS rhash "
        "FROM documents"
    )


_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def ann_exact_sql(k: int = 5, query_mod: int = 50) -> str:
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % {query_mod} = 0),
pr AS (SELECT q.vec_id AS query_id, c.vec_id AS match_id,
              q.embedding AS qe, c.embedding AS ce
       FROM embeddings c, q WHERE q.vec_id <> c.vec_id),
s AS (SELECT query_id, match_id, {cos} AS cs FROM pr)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_sq8_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of similarity.sq8_topk: per-dim global [min,max] codes
    (floor, not round-half-even — bit-reproducible), asymmetric scoring
    against the reconstructed corpus vector."""
    recon = (
        "list_transform(embedding, (x, i) -> CASE WHEN mx[i] > mn[i] "
        "THEN mn[i] + (FLOOR((CAST(x AS DOUBLE) - mn[i]) / (mx[i] - mn[i]) "
        "* 255.0 + 0.5) * (mx[i] - mn[i])) / 255.0 ELSE mn[i] END)"
    )
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH d AS (SELECT i AS pos, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
           FROM (SELECT unnest(embedding) AS x,
                        generate_subscripts(embedding, 1) AS i FROM embeddings)
           GROUP BY i),
st AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
c AS (SELECT vec_id AS match_id, {recon} AS ce FROM embeddings, st),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % {query_mod} = 0),
s AS (SELECT query_id, match_id, {cos} AS cs FROM c, q WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def _srp_sig(bits: int, plane_offset: int = 0) -> str:
    # SRP signature; DuckDB lambda index i is 1-based == Spark's (i+1).
    # Plane-weight hash mirrors similarity._SRP_MULT/_SRP_QUAD/_SRP_MOD:
    # w(p, i) = +1 iff (i*M*(p+1) + Q*(p+1)^2) mod 2^32 < 2^31.
    bit_exprs = []
    for b in range(bits):
        p1 = plane_offset + b + 1
        s = (
            f"list_sum(list_transform({{v}}, (x, i) -> CAST(x AS DOUBLE) * "
            f"(CASE WHEN (i * {2654435761 * p1} + {40503 * p1 * p1}) % 4294967296 "
            f"< 2147483648 THEN 1.0 ELSE -1.0 END)))"
        )
        bit_exprs.append(f"(CASE WHEN {s} >= 0 THEN '1' ELSE '0' END)")
    return "CONCAT(" + ", ".join(bit_exprs) + ")"


def ann_lsh_sql(k: int = 5, bits: int = 6, bands: int = 16, query_mod: int = 50) -> str:
    """Twin of similarity.lsh_topk's banded OR-construction: per-band
    signatures UNION ALL into (vec_id, band, sig); candidates = DISTINCT
    pairs sharing any band bucket; exact cosine ranks candidates."""
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {g} AS band, "
        f"{_srp_sig(bits, plane_offset=g * bits).format(v='embedding')} AS sig "
        "FROM embeddings"
        for g in range(bands)
    )
    return f"""
WITH sigs AS ({band_selects}),
q AS (SELECT vec_id AS query_id, band, sig FROM sigs WHERE vec_id % {query_mod} = 0),
c AS (SELECT vec_id AS match_id, band, sig FROM sigs),
pairs AS (SELECT DISTINCT query_id, match_id
          FROM c JOIN q USING (band, sig) WHERE query_id <> match_id),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM pairs
      JOIN (SELECT vec_id, embedding AS qe FROM embeddings) eq ON eq.vec_id = query_id
      JOIN (SELECT vec_id, embedding AS ce FROM embeddings) ec ON ec.vec_id = match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_ivf_sql(
    k: int = 5, centroid_mod: int = 100, nprobe: int = 2, query_mod: int = 50
) -> str:
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {centroid_mod} = 1),
assigned AS (
  SELECT match_id, ce, centroid_id FROM (
    SELECT c.vec_id AS match_id, c.embedding AS ce, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings) c, cents)
  WHERE arank = 1),
probes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qe, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS prank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings
          WHERE vec_id % {query_mod} = 0) q, cents)
  WHERE prank <= {nprobe}),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM assigned JOIN probes USING (centroid_id)
      WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ivf_index_stats_sql(centroid_mod: int = 100) -> str:
    """Twin of ann_index_stats: per-list occupancy + the FAISS
    imbalance factor (sum(size²)·K/N²)."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {centroid_mod} = 1),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT c.vec_id, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings) c, cents)
  WHERE arank = 1),
sizes AS (SELECT centroid_id, COUNT(*) AS list_size FROM assigned GROUP BY 1),
tot AS (SELECT SUM(list_size) AS n, COUNT(*) AS k,
               SUM(list_size * list_size) AS ss FROM sizes)
SELECT centroid_id, list_size,
       ROUND(list_size / n, 6) AS pct_of_corpus,
       ROUND(CAST(ss AS DOUBLE) * k / (n * n), 6) AS imbalance_factor
FROM sizes, tot"""


def ivf_index_append_sql(
    centroid_mod: int = 100, batch_mod: int = 7
) -> str:
    """Twin of ann_index_append with the batch carved as
    vec_id % batch_mod == 0 and the corpus as the rest (the registry
    convention for incremental-ingest fixtures)."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {batch_mod} <> 0
                 AND vec_id % {centroid_mod} = 1)
SELECT vec_id, centroid_id, ROUND(cs, 6) AS cent_sim FROM (
  SELECT b.vec_id, cents.centroid_id, ({cent_cos}) AS cs,
         ROW_NUMBER() OVER (PARTITION BY b.vec_id
           ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
  FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings
        WHERE vec_id % {batch_mod} = 0) b, cents)
WHERE arank = 1"""


def ann_ivf_filtered_sql(
    k: int = 5, centroid_mod: int = 100, nprobe: int = 2, query_mod: int = 50
) -> str:
    """Twin of ann_topk_filtered: ann_ivf_sql with the label equality
    predicate riding the probe join key."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {centroid_mod} = 1),
assigned AS (
  SELECT match_id, ce, fv, centroid_id FROM (
    SELECT c.vec_id AS match_id, c.embedding AS ce, c.label AS fv,
           cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, embedding, label, embedding AS v FROM embeddings) c, cents)
  WHERE arank = 1),
probes AS (
  SELECT query_id, qe, fv, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qe, q.label AS fv,
           cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS prank
    FROM (SELECT vec_id, embedding, label, embedding AS v FROM embeddings
          WHERE vec_id % {query_mod} = 0) q, cents)
  WHERE prank <= {nprobe}),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM assigned JOIN probes USING (centroid_id, fv)
      WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_knn_join_sql(
    k: int = 5, centroid_mod: int = 100, nprobe: int = 2
) -> str:
    """Twin of ann_knn_join: every vector is a query; one shared
    nearest-list ranking feeds both the assignment (rank 1) and the
    probe side (rank ≤ nprobe)."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {centroid_mod} = 1),
ranked AS (
  SELECT vid, e, centroid_id, crank FROM (
    SELECT c.vec_id AS vid, c.embedding AS e, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS crank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings) c, cents)
  WHERE crank <= {nprobe}),
assigned AS (SELECT vid AS match_id, e AS ce, centroid_id
             FROM ranked WHERE crank = 1),
probes AS (SELECT vid AS query_id, e AS qe, centroid_id FROM ranked),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM assigned JOIN probes USING (centroid_id)
      WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def _kmeans_cents_ctes(centroid_mod: int = 100, iters: int = 2) -> str:
    """CTE chain (no leading WITH) ending in ``cents(centroid_id, cv)`` —
    trained centroids, twin of similarity.kmeans_centroids: modulo seeds,
    ``iters`` unrolled Lloyd rounds (fixed count = no data-dependent
    control flow), per-cluster means through the integer micro-unit
    quantization (``FLOOR(x·1e6)`` BIGINT sums — aggregation-order-
    independent, so Spark's shuffle-order partial sums and DuckDB's
    scan-order sums agree bit-for-bit), empty clusters keeping their
    previous centroid."""
    cent_cos = (
        f"({_DOT.format(a='v', b='cv')} / "
        f"({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    )
    ctes = [
        "corpus AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM corpus "
        f"WHERE vec_id % {centroid_mod} = 1)",
    ]
    for i in range(iters):
        prev = f"c{i}"
        ctes.append(
            f"""a{i + 1} AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT corpus.vec_id, corpus.v, {prev}.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY corpus.vec_id
             ORDER BY ({cent_cos}) DESC, {prev}.centroid_id) AS arank
    FROM corpus, {prev})
  WHERE arank = 1)"""
        )
        ctes.append(
            f"""m{i + 1} AS (
  SELECT centroid_id, pos,
         SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS qs, COUNT(*) AS n
  FROM (SELECT centroid_id, unnest(v) AS x,
               generate_subscripts(v, 1) AS pos FROM a{i + 1})
  GROUP BY centroid_id, pos)"""
        )
        ctes.append(
            f"""c{i + 1} AS (
  SELECT {prev}.centroid_id, COALESCE(nv.nv, {prev}.cv) AS cv
  FROM {prev} LEFT JOIN (
    SELECT centroid_id,
           list(CAST(qs AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS nv
    FROM m{i + 1} GROUP BY centroid_id) nv USING (centroid_id))"""
        )
    ctes.append(f"cents AS (SELECT centroid_id, cv FROM c{iters})")
    return ",\n".join(ctes)


def kmeans_cents_sql(centroid_mod: int = 100, iters: int = 2) -> str:
    """Twin of the ivf_kmeans_centroids registry query: trained centroids
    exploded to (centroid_id, pos, val) rows so the driver's scalar
    value-hash covers every component."""
    return f"""
WITH {_kmeans_cents_ctes(centroid_mod, iters)}
SELECT centroid_id, CAST(pos - 1 AS INT) AS pos, val FROM (
  SELECT centroid_id, unnest(cv) AS val,
         generate_subscripts(cv, 1) AS pos FROM cents)"""


def ann_ivf_kmeans_sql(
    k: int = 5,
    centroid_mod: int = 100,
    nprobe: int = 2,
    query_mod: int = 50,
    iters: int = 2,
) -> str:
    """Twin of ann_topk_ivf_kmeans: ann_ivf_sql's probe structure over
    the Lloyd-trained centroid chain instead of the raw modulo seeds."""
    cent_cos = (
        f"({_DOT.format(a='v', b='cv')} / "
        f"({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    )
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH {_kmeans_cents_ctes(centroid_mod, iters)},
assigned AS (
  SELECT match_id, ce, centroid_id FROM (
    SELECT c.vec_id AS match_id, c.v AS ce, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, v FROM corpus) c, cents)
  WHERE arank = 1),
probes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qe, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS prank
    FROM (SELECT vec_id, v FROM corpus
          WHERE vec_id % {query_mod} = 0) q, cents)
  WHERE prank <= {nprobe}),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM assigned JOIN probes USING (centroid_id)
      WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


_L2 = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "z -> (z[1] - z[2]) * (z[1] - z[2])))"
)


def _pq_books_ctes(dim: int, m: int, sub_mod: int, iters: int) -> str:
    """CTE chain (no WITH; expects ``corpus(vec_id, v)``) ending in
    ``books(subspace, centroid_id, cv)`` — per-subspace PQ codebooks,
    twin of similarity.pq_codebooks: modulo-seeded sub-vectors, L2
    Lloyd rounds with the integer micro-unit mean quantization, (asc
    distance, asc centroid_id) assignment ties, empty codes keeping
    their previous codeword."""
    d0 = dim // m
    sub = f"list_slice(c.v, b.subspace * {d0} + 1, b.subspace * {d0} + {d0})"
    l2 = _L2.format(a=sub, b="b.cv")
    ctes = [
        f"""b0 AS (
  SELECT s.s AS subspace, vec_id AS centroid_id,
         list_slice(v, s.s * {d0} + 1, s.s * {d0} + {d0}) AS cv
  FROM corpus, (SELECT unnest(range({m})) AS s) AS s
  WHERE vec_id % {sub_mod} = 1)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""qa{i} AS (
  SELECT vec_id, subspace, code FROM (
    SELECT c.vec_id, b.subspace, b.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id, b.subspace
             ORDER BY ({l2}) ASC, b.centroid_id) AS r
    FROM corpus c, b{i - 1} b)
  WHERE r = 1)"""
        )
        ctes.append(
            f"""qm{i} AS (
  SELECT subspace, code, pos,
         SUM(CAST(FLOOR(x * 1000000.0) AS BIGINT)) AS qs, COUNT(*) AS n
  FROM (SELECT a.subspace, a.code,
               unnest(list_slice(c.v, a.subspace * {d0} + 1,
                                 a.subspace * {d0} + {d0})) AS x,
               generate_subscripts(list_slice(c.v, a.subspace * {d0} + 1,
                                              a.subspace * {d0} + {d0}), 1) AS pos
        FROM qa{i} a JOIN corpus c USING (vec_id))
  GROUP BY 1, 2, 3)"""
        )
        ctes.append(
            f"""b{i} AS (
  SELECT b.subspace, b.centroid_id, COALESCE(nv.nv, b.cv) AS cv
  FROM b{i - 1} b LEFT JOIN (
    SELECT subspace, code AS centroid_id,
           list(CAST(qs AS DOUBLE) / (1000000.0 * n) ORDER BY pos) AS nv
    FROM qm{i} GROUP BY 1, 2) nv USING (subspace, centroid_id))"""
        )
    ctes.append(f"books AS (SELECT subspace, centroid_id, cv FROM b{iters})")
    return ",\n".join(ctes)


def pq_codebooks_sql(
    dim: int = 64, m: int = 8, sub_mod: int = 5, iters: int = 2
) -> str:
    """Twin of the pq_codebooks registry query: trained per-subspace
    codebooks exploded to (subspace, centroid_id, pos, val)."""
    return f"""
WITH corpus AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
{_pq_books_ctes(dim, m, sub_mod, iters)}
SELECT CAST(subspace AS INT) AS subspace, centroid_id,
       CAST(pos - 1 AS INT) AS pos, val FROM (
  SELECT subspace, centroid_id, unnest(cv) AS val,
         generate_subscripts(cv, 1) AS pos FROM books)"""


def ann_ivf_pq_sql(
    k: int = 5,
    centroid_mod: int = 100,
    cents_iters: int = 3,
    nprobe: int = 2,
    dim: int = 64,
    m: int = 8,
    sub_mod: int = 5,
    pq_iters: int = 2,
    refine: int = 40,
    query_mod: int = 50,
) -> str:
    """Twin of ann_topk_ivf_pq — the full production composition:
    Lloyd-trained coarse centroids (kmeans chain) × L2-Lloyd PQ
    codebooks (books chain), PQ-code payload reconstructed as
    concatenated sub-centroids for shortlist scoring, then the
    IndexRefineFlat re-rank of the top-``refine`` with exact cosine."""
    d0 = dim // m
    sub = f"list_slice(c.v, b.subspace * {d0} + 1, b.subspace * {d0} + {d0})"
    l2 = _L2.format(a=sub, b="b.cv")
    cent_cos = (
        f"({_DOT.format(a='v', b='cv')} / "
        f"({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    )
    recon_cos = (
        f"({_DOT.format(a='qe', b='rv')} / "
        f"({_NORM.format(a='qe')} * {_NORM.format(a='rv')}))"
    )
    exact_cos = (
        f"({_DOT.format(a='qe', b='fv')} / "
        f"({_NORM.format(a='qe')} * {_NORM.format(a='fv')}))"
    )
    return f"""
WITH {_kmeans_cents_ctes(centroid_mod, cents_iters)},
{_pq_books_ctes(dim, m, sub_mod, pq_iters)},
pcode AS (
  SELECT vec_id, subspace, code FROM (
    SELECT c.vec_id, b.subspace, b.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id, b.subspace
             ORDER BY ({l2}) ASC, b.centroid_id) AS r
    FROM corpus c, books b)
  WHERE r = 1),
precon AS (
  SELECT p.vec_id, flatten(list(b.cv ORDER BY p.subspace)) AS rv
  FROM pcode p JOIN books b
    ON b.subspace = p.subspace AND b.centroid_id = p.code
  GROUP BY p.vec_id),
passigned AS (
  SELECT a.match_id, a.centroid_id, precon.rv FROM (
    SELECT match_id, centroid_id FROM (
      SELECT c.vec_id AS match_id, cents.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
               ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
      FROM (SELECT vec_id, v FROM corpus) c, cents)
    WHERE arank = 1) a
  JOIN precon ON precon.vec_id = a.match_id),
pprobes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qe, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS prank
    FROM (SELECT vec_id, v FROM corpus
          WHERE vec_id % {query_mod} = 0) q, cents)
  WHERE prank <= {nprobe}),
ps AS (SELECT query_id, match_id, qe, {recon_cos} AS cs
       FROM passigned JOIN pprobes USING (centroid_id)
       WHERE query_id <> match_id),
shortlist AS (
  SELECT query_id, match_id, qe FROM (
    SELECT query_id, match_id, qe,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cs DESC, match_id) AS rr
    FROM ps)
  WHERE rr <= {refine}),
rescored AS (
  SELECT s.query_id, s.match_id, {exact_cos} AS cs
  FROM (SELECT query_id, match_id, qe FROM shortlist) s
  JOIN (SELECT vec_id, v AS fv FROM corpus) c ON c.vec_id = s.match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM rescored)
WHERE rank <= {k}"""


def ann_nprobe_curve_sql(
    k: int = 5, query_mod: int = 50, centroid_mod: int = 100
) -> str:
    """Twin of ann_nprobe_curve: IVF recall@k at nprobe 1/2/4, one leg
    per setting, method names carrying the nprobe."""
    def leg(p: int) -> str:
        return f"""
SELECT ex.query_id, 'ivf_nprobe_{p}' AS method,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS recall
FROM ({ann_exact_sql(k=k, query_mod=query_mod)}) ex
LEFT JOIN ({ann_ivf_sql(k=k, centroid_mod=centroid_mod, nprobe=p,
                        query_mod=query_mod)}) ap
  ON ex.query_id = ap.query_id AND ex.match_id = ap.match_id
GROUP BY ex.query_id"""

    return "\nUNION ALL\n".join(leg(p) for p in (1, 2, 4))


def ann_recall_pq_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of ann_recall_pq: recall@k of IVF×PQ+refine vs the exact
    top-k."""
    return f"""
SELECT ex.query_id, 'ivf_pq' AS method,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS recall
FROM ({ann_exact_sql(k=k, query_mod=query_mod)}) ex
LEFT JOIN ({ann_ivf_pq_sql(k=k, query_mod=query_mod)}) ap
  ON ex.query_id = ap.query_id AND ex.match_id = ap.match_id
GROUP BY ex.query_id"""


def ann_recall_kmeans_sql(
    k: int = 5, query_mod: int = 50, centroid_mod: int = 100, iters: int = 2
) -> str:
    """Twin of ann_recall_kmeans: recall@k of the trained-centroid IVF
    vs the exact top-k — the before/after read-off for Lloyd training
    (pair with ann_recall's 'ivf' leg for the untrained number)."""
    return f"""
SELECT ex.query_id, 'ivf_kmeans' AS method,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS recall
FROM ({ann_exact_sql(k=k, query_mod=query_mod)}) ex
LEFT JOIN ({ann_ivf_kmeans_sql(k=k, centroid_mod=centroid_mod, nprobe=2,
                               query_mod=query_mod, iters=iters)}) ap
  ON ex.query_id = ap.query_id AND ex.match_id = ap.match_id
GROUP BY ex.query_id"""


def embedding_cosine_dup_sql(threshold: float = 0.9, bits: int = 4) -> str:
    sig = _srp_sig(bits)
    cos = f"({_DOT.format(a='va', b='vb')} / ({_NORM.format(a='va')} * {_NORM.format(a='vb')}))"
    return f"""
WITH base AS (SELECT vec_id, embedding, {sig.format(v='embedding')} AS sig FROM embeddings),
pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              a.embedding AS va, b.embedding AS vb
       FROM base a JOIN base b USING (sig) WHERE a.vec_id < b.vec_id),
s AS (SELECT vec_a, vec_b, {cos} AS cs FROM pr)
SELECT vec_a, vec_b, ROUND(cs, 6) AS cosine_sim FROM s WHERE cs >= {threshold}"""


def _band_ctes(num_perm: int, bands: int) -> str:
    """Shared CTE chain: shingles → MinHash → LSH band buckets
    ``bs(doc_id, band, band_sig)`` (twin of operators/dedup.band_signatures)."""
    rpb = num_perm // bands
    return f"""{_shingle_ctes()},
pp AS (SELECT doc_id, shingle, unnest(range(0, {num_perm})) AS perm FROM e),
sig AS (SELECT doc_id, perm,
               MIN(md5(CONCAT(CAST(perm AS STRING), '|', shingle))) AS minhash
        FROM pp GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(perm // {rpb} AS BIGINT) AS band,
              array_to_string(list_sort(list(minhash)), ',') AS band_sig
       FROM sig GROUP BY 1, 2)"""


def _components_ctes(num_perm: int, bands: int) -> str:
    """Band CTEs + pair graph + recursive transitive closure →
    ``comp(node, component)``."""
    return f"""{_band_ctes(num_perm, bands)},
prs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bs a JOIN bs b ON a.band = b.band AND a.band_sig = b.band_sig
        WHERE a.doc_id < b.doc_id),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION SELECT doc_b, doc_a FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)"""


def dedup_components_sql(num_perm: int = 8, bands: int = 4) -> str:
    """Transitive closure of the MinHash-LSH pair graph (recursive CTE)
    -> per-document canonical id. Twin of operators/dedup.py
    dedup_components over minhash_lsh_pairs."""
    return f"""
WITH RECURSIVE {_components_ctes(num_perm, bands)}
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS canonical_id,
       COALESCE(c.component, d.doc_id) <> d.doc_id AS is_duplicate
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"""


def dedup_keep_best_sql(num_perm: int = 8, bands: int = 4) -> str:
    """Keep-best twin of operators/dedup.py dedup_keep_best: canonical =
    longest text in the component, ties to the smallest doc_id."""
    return f"""
WITH RECURSIVE {_components_ctes(num_perm, bands)},
ranked AS (SELECT c.component, d.doc_id,
                  ROW_NUMBER() OVER (PARTITION BY c.component
                                     ORDER BY LENGTH(d.text) DESC, d.doc_id) AS rn
           FROM comp c JOIN documents d ON d.doc_id = c.node),
best AS (SELECT component, doc_id AS best_id FROM ranked WHERE rn = 1)
SELECT d.doc_id,
       COALESCE(b.best_id, d.doc_id) AS canonical_id,
       COALESCE(b.best_id, d.doc_id) <> d.doc_id AS is_duplicate
FROM documents d
LEFT JOIN comp c ON c.node = d.doc_id
LEFT JOIN best b ON b.component = c.component"""


def decontaminate_sql(n: int = 8, modulus: int = 17, residue: int = 3) -> str:
    """Twin of operators/dedup.py decontaminate with the benchmark set
    carved from documents as ``doc_id % modulus = residue`` (exactly how
    the registry query builds it)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - {n - 1}, 0) + 1),
               i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS sh
      FROM t),
e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
b AS (SELECT DISTINCT doc_id AS bench_id, shingle FROM e
      WHERE doc_id % {modulus} = {residue}),
h AS (SELECT e.doc_id, COUNT(DISTINCT e.shingle) AS hit_shingles,
             MIN(b.bench_id) AS min_bench_id
      FROM e JOIN b USING (shingle) GROUP BY 1)
SELECT d.doc_id,
       h.doc_id IS NOT NULL AS contaminated,
       COALESCE(h.hit_shingles, 0) AS hit_shingles,
       h.min_bench_id
FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"""


def repetition_stats_sql(
    top_token_max: float = 0.10, dup_2gram_max: float = 0.30
) -> str:
    """Twin of operators/quality.repetition_stats: token histogram via
    unnest+group-by, 2-gram duplicate fraction via list exprs."""
    toks = _TOKS.format(t="lower(text)")
    top_tok = "CASE WHEN len(toks) > 0 THEN COALESCE(top_c, 0)::DOUBLE / len(toks) ELSE 0.0 END"
    dup2 = (
        "CASE WHEN len(sh2) > 0 THEN (len(sh2) - len(list_distinct(sh2)))::DOUBLE"
        " / len(sh2) ELSE 0.0 END"
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
r AS (SELECT doc_id, toks,
        list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                       i -> array_to_string(toks[i:i+1], ' ')) AS sh2
      FROM t),
h AS (SELECT doc_id, max(c) AS top_c
      FROM (SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY 1, 2)
      GROUP BY 1)
SELECT r.doc_id,
  len(toks) AS n_tokens,
  ROUND(CASE WHEN len(toks) > 0
             THEN (len(toks) - len(list_distinct(toks)))::DOUBLE / len(toks)
             ELSE 0.0 END, 6) AS dup_token_frac,
  ROUND({top_tok}, 6) AS top_token_frac,
  ROUND({dup2}, 6) AS dup_2gram_frac,
  ({top_tok} > {top_token_max} OR {dup2} > {dup_2gram_max}) AS is_repetitive
FROM r LEFT JOIN h USING (doc_id)"""


def boilerplate_ngrams_sql(top_k: int = 20, flag_frac: float = 0.5) -> str:
    """Twin of operators/quality.boilerplate_ngrams over the shared
    3-gram shingle CTEs; top-k ties break on the shingle string so the
    cut is engine-identical."""
    frac = "CASE WHEN len(sh) > 0 THEN COALESCE(nb, 0)::DOUBLE / len(sh) ELSE 0.0 END"
    return f"""
WITH {_shingle_ctes()},
c AS (SELECT shingle, count(*) AS df FROM e GROUP BY 1),
k AS (SELECT shingle FROM c ORDER BY df DESC, shingle LIMIT {top_k}),
b AS (SELECT doc_id, count(*) AS nb FROM e JOIN k USING (shingle) GROUP BY 1)
SELECT s.doc_id,
  len(sh) AS n_shingles,
  COALESCE(nb, 0) AS n_boiler,
  ROUND({frac}, 6) AS boiler_frac,
  ({frac} >= {flag_frac}) AS is_boilerplate
FROM s LEFT JOIN b USING (doc_id)"""


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{2} \d{2} \d{3} \d{4}"


def pii_redact_sql() -> str:
    """Twin of operators/quality.pii_redact: identical deterministic
    contact blurb, identical regexes (Java/RE2 common subset), byte
    equality on the masked text."""
    return f"""
WITH a AS (
  SELECT doc_id,
         text || ' Contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call +36 30 555 '
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
              || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@example.org'
                      ELSE '' END AS aug
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(aug, '{PII_EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(aug, '{PII_PHONE_RE}')) AS n_phones,
  regexp_replace(regexp_replace(aug, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{PII_PHONE_RE}', '[PHONE]', 'g') AS redacted
FROM a"""


def pack_sequences_sql(ctx: int = 512) -> str:
    """Twin of operators/packing.pack_sequences: exact global prefix sum
    over doc_id order, integer-division bin spans."""
    toks = _TOKS.format(t="text")
    return f"""
WITH t AS (SELECT doc_id, len({toks}) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS global_offset
      FROM t)
SELECT doc_id, n_tokens, global_offset,
  CAST(global_offset // {ctx} AS BIGINT) AS bin_first,
  CAST(CASE WHEN n_tokens > 0 THEN (global_offset + n_tokens - 1) // {ctx}
       ELSE global_offset // {ctx} END AS BIGINT) AS bin_last,
  CAST(global_offset % {ctx} AS BIGINT) AS bin_offset,
  CAST((CASE WHEN n_tokens > 0 THEN (global_offset + n_tokens - 1) // {ctx}
        ELSE global_offset // {ctx} END) - global_offset // {ctx} + 1
    AS BIGINT) AS n_bins_spanned
FROM c"""


def lsh_agreement_sql(
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> str:
    """Twin of operators/dedup.lsh_agreement: composes the two existing
    oracle statements as CTE-bearing subqueries."""
    return f"""
WITH truth AS (SELECT * FROM ({ngram_jaccard_sql(threshold=threshold)})),
cand AS (SELECT * FROM ({minhash_lsh_sql(num_perm=num_perm, bands=bands)}))
SELECT COALESCE(t.doc_a, c.doc_a) AS doc_a,
       COALESCE(t.doc_b, c.doc_b) AS doc_b,
       CASE WHEN t.doc_a IS NOT NULL AND c.doc_a IS NOT NULL THEN 'hit'
            WHEN t.doc_a IS NOT NULL THEN 'missed'
            ELSE 'extra' END AS status
FROM truth t FULL OUTER JOIN cand c
  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b"""


def bm25_topk_sql(
    queries=None,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of operators/retrieval.bm25_topk.

    Determinism contract (mirrored Spark-side): per-(query, doc) float
    contributions are summed IN TERM ORDER (``list(c ORDER BY term)`` →
    list_sum, vs array_sort → aggregate), and the top-k cut orders by
    the 6-dp-ROUNDED score with a doc_id tie-break.
    """
    from .operators.retrieval import DEFAULT_QUERIES, _query_terms

    pairs = _query_terms(DEFAULT_QUERIES if queries is None else queries)
    values = ", ".join(f"({qid}, '{t}')" for qid, t in pairs)
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
lens AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
qt AS (SELECT * FROM (VALUES {values}) AS v(query_id, term)),
matched AS (
  SELECT b.doc_id, len(b.toks) AS dl, t.term, COUNT(*) AS tf
  FROM base b, UNNEST(b.toks) AS t(term)
  WHERE t.term IN (SELECT DISTINCT term FROM qt)
  GROUP BY b.doc_id, len(b.toks), t.term),
dfq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
contrib AS (
  SELECT qt.query_id, m.doc_id, m.term,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (m.tf * {k1 + 1.0!r}) / (m.tf + {k1!r} * (1.0 - {b!r} + {b!r} * m.dl / s.avgdl)) AS c
  FROM matched m
  JOIN dfq d ON m.term = d.term
  JOIN qt ON m.term = qt.term
  CROSS JOIN stats s),
scored AS (
  SELECT query_id, doc_id, list_sum(list(c ORDER BY term)) AS score
  FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, ROUND(score, 6) AS bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id) AS rank
  FROM scored)
SELECT query_id, doc_id, bm25, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


def bigram_lm_score_sql() -> str:
    """Twin of operators/quality.bigram_lm_score: add-one bigram LM
    trained on the corpus, per-doc mean log-prob + perplexity, log-probs
    folded in position order for bit-identical double sums."""
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents),
bg AS (
  SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2
  FROM base, UNNEST(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       i -> struct_pack(pos := i, w1 := toks[i], w2 := toks[i+1]))) AS u(s)),
uni AS (
  SELECT t.w1 AS w1, COUNT(*) AS c1
  FROM (SELECT UNNEST(toks) AS w1 FROM base) t GROUP BY t.w1),
vocab AS (SELECT COUNT(*) AS v FROM uni),
bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
sc AS (
  SELECT bg.doc_id, bg.pos,
         ln((bic.c2 + 1.0) / (uni.c1 + vocab.v)) AS logp
  FROM bg
  JOIN bic ON bg.w1 = bic.w1 AND bg.w2 = bic.w2
  JOIN uni ON bg.w1 = uni.w1
  CROSS JOIN vocab),
agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         list_sum(list(logp ORDER BY pos)) AS s
  FROM sc GROUP BY doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       ROUND(s / n_bigrams, 6) AS avg_logp,
       ROUND(exp(-(s / n_bigrams)), 6) AS perplexity
FROM agg"""


def vocab_topk_sql(k: int = 100) -> str:
    """Twin of operators/quality.vocab_topk (ties break on term asc)."""
    return f"""
WITH e AS (
  SELECT doc_id, UNNEST({_TOKS.format(t='text')}) AS term FROM documents),
uni AS (
  SELECT term, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS df
  FROM e GROUP BY term),
topk AS (SELECT * FROM uni ORDER BY freq DESC, term LIMIT {k})
SELECT term, freq, df,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
FROM topk"""


def leakage_safe_split_sql(
    num_perm: int = 8,
    bands: int = 4,
    train: float = 0.9,
    val: float = 0.05,
    buckets: int = 1000,
) -> str:
    """Twin of operators/sampling.leakage_safe_split over
    dedup_components(minhash_lsh_pairs): the MINSTD bucket of the
    component-canonical id decides the whole component's split."""
    t_hi = int(round(train * buckets))
    v_hi = t_hi + int(round(val * buckets))
    return f"""
WITH RECURSIVE {_components_ctes(num_perm, bands)},
canon AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
SELECT doc_id, canonical_id,
       CASE WHEN ((canonical_id * 48271) % 2147483647) % {buckets} < {t_hi} THEN 'train'
            WHEN ((canonical_id * 48271) % 2147483647) % {buckets} < {v_hi} THEN 'val'
            ELSE 'test' END AS split
FROM canon"""


def corpus_gate_sql(min_tokens: int = 15, max_perplexity: float = 31.0) -> str:
    """Twin of operators/quality.corpus_gate: composes the
    repetition-stats and bigram-LM oracle bodies, first-failing-rule
    verdict; the perplexity compare uses the 6-dp-rounded value both
    engines emit identically."""
    return f"""
WITH rep AS (SELECT * FROM ({repetition_stats_sql()})),
lm AS (SELECT * FROM ({bigram_lm_score_sql()})),
tok AS (
  SELECT doc_id, len({_TOKS.format(t='text')}) AS nt FROM documents),
g AS (
  SELECT t.doc_id,
         CASE WHEN t.nt < {min_tokens} THEN 'too_short'
              WHEN r.is_repetitive THEN 'repetitive'
              WHEN lm.perplexity IS NOT NULL AND lm.perplexity > {max_perplexity!r}
                THEN 'high_perplexity'
              ELSE 'keep' END AS reason
  FROM tok t
  JOIN rep r ON t.doc_id = r.doc_id
  LEFT JOIN lm ON t.doc_id = lm.doc_id)
SELECT doc_id, reason, reason = 'keep' AS keep FROM g"""


def lsh_arrival_dedup_sql(num_perm: int = 8, bands: int = 4) -> str:
    """Twin of operators/dedup.lsh_arrival_dedup: greedy bucket-claim
    dedup — smallest doc_id owns each band bucket; a doc is a duplicate
    iff any of its buckets has an earlier owner."""
    return f"""
WITH {_band_ctes(num_perm, bands)},
own AS (SELECT band, band_sig, MIN(doc_id) AS owner
        FROM bs GROUP BY band, band_sig),
j AS (SELECT b.doc_id, o.owner
      FROM bs b JOIN own o ON b.band = o.band AND b.band_sig = o.band_sig),
v AS (SELECT doc_id,
             MIN(CASE WHEN owner <> doc_id THEN owner END) AS dup_src,
             BOOL_OR(owner <> doc_id) AS isd
      FROM j GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(v.dup_src, d.doc_id) AS dup_of,
       COALESCE(v.isd, FALSE) AS is_duplicate
FROM documents d LEFT JOIN v ON v.doc_id = d.doc_id"""


def corpus_release_sql(
    num_perm: int = 8,
    bands: int = 4,
    train: float = 0.9,
    val: float = 0.05,
    buckets: int = 1000,
) -> str:
    """Twin of operators/sampling.corpus_release: gate → keep-best dedup
    → leakage-safe split, composed from the verified oracle bodies."""
    t_hi = int(round(train * buckets))
    v_hi = t_hi + int(round(val * buckets))
    return f"""
WITH g AS (SELECT * FROM ({corpus_gate_sql()})),
kb AS (SELECT * FROM ({dedup_keep_best_sql(num_perm, bands)}))
SELECT g.doc_id,
       CASE WHEN g.reason <> 'keep' THEN 'gate:' || g.reason
            WHEN kb.is_duplicate THEN 'duplicate'
            WHEN ((kb.canonical_id * 48271) % 2147483647) % {buckets} < {t_hi} THEN 'train'
            WHEN ((kb.canonical_id * 48271) % 2147483647) % {buckets} < {v_hi} THEN 'val'
            ELSE 'test' END AS disposition
FROM g JOIN kb ON g.doc_id = kb.doc_id"""


def ann_recall_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of the ann_recall registry query: recall@k of the LSH and IVF
    top-k vs the exact top-k, one row per (query, method)."""
    def leg(name: str, approx_sql: str) -> str:
        return f"""
SELECT ex.query_id, '{name}' AS method,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       ROUND(CAST(SUM(CASE WHEN ap.match_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS recall
FROM ({ann_exact_sql(k=k, query_mod=query_mod)}) ex
LEFT JOIN ({approx_sql}) ap
  ON ex.query_id = ap.query_id AND ex.match_id = ap.match_id
GROUP BY ex.query_id"""

    return (
        leg("lsh", ann_lsh_sql(k=k, bits=6, bands=16, query_mod=query_mod))
        + "\nUNION ALL\n"
        + leg("ivf", ann_ivf_sql(k=k, centroid_mod=100, nprobe=2, query_mod=query_mod))
        + "\nUNION ALL\n"
        + leg("sq8", ann_sq8_sql(k=k, query_mod=query_mod))
    )


def substring_spans_sql(k: int = 8, flag_frac: float = 0.5) -> str:
    """Twin of operators/dedup.substring_spans: per-position k-gram
    windows via range+slice, HAVING count>=2 for corpus-duplicated
    windows, lag-clamped span coverage per doc."""
    toks = _TOKS.format(t="lower(text)")
    frac = (
        "CASE WHEN len(toks) > 0 THEN COALESCE(covered, 0)::DOUBLE / len(toks)"
        " ELSE 0.0 END"
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+{k - 1}], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS i
            FROM t)),
d AS (SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2),
p AS (SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM w JOIN d USING (win)),
c AS (SELECT doc_id, count(*) AS n_dup_windows,
             sum(CASE WHEN prev IS NULL THEN {k}
                      ELSE least({k}, pos - prev) END) AS covered
      FROM p GROUP BY 1)
SELECT t.doc_id, len(toks) AS n_tokens,
  COALESCE(n_dup_windows, 0) AS n_dup_windows,
  COALESCE(covered, 0)::BIGINT AS dup_span_tokens,
  ROUND({frac}, 6) AS dup_frac,
  ({frac} >= {flag_frac}) AS is_substring_dup
FROM t LEFT JOIN c USING (doc_id)"""


def substring_rewrite_sql(k: int = 8) -> str:
    """Twin of operators/dedup.substring_rewrite: covered token indices
    via unnest(range(pos, pos+k)), anti-join against token positions,
    ordered string_agg reassembly."""
    toks = _TOKS.format(t="lower(text)")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+{k - 1}], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS i
            FROM t)),
d AS (SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2),
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {k})) AS idx
        FROM w JOIN d USING (win)),
ti AS (SELECT doc_id, i - 1 AS idx, toks[i] AS tok
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)),
kept AS (SELECT ti.doc_id, count(*) AS n_kept,
                string_agg(tok, ' ' ORDER BY idx) AS text_rewritten
         FROM ti ANTI JOIN cov ON ti.doc_id = cov.doc_id AND ti.idx = cov.idx
         GROUP BY 1)
SELECT t.doc_id, len(toks) AS n_tokens,
  (len(toks) - COALESCE(n_kept, 0))::BIGINT AS n_removed,
  COALESCE(text_rewritten, '') AS text_rewritten
FROM t LEFT JOIN kept USING (doc_id)"""


def lsh_index_probe_sql(
    batch_mod: int = 7, num_perm: int = 8, bands: int = 4
) -> str:
    """Twin of operators/dedup.lsh_index_probe over the corpus/batch
    split doc_id % batch_mod: shared minhash band CTEs, one-sided
    bucket join, min matched corpus id."""
    rpb = num_perm // bands
    return f"""
WITH {_shingle_ctes()},
pp AS (SELECT doc_id, shingle, unnest(range(0, {num_perm})) AS perm FROM e),
sig AS (SELECT doc_id, perm,
               MIN(md5(CONCAT(CAST(perm AS STRING), '|', shingle))) AS minhash
        FROM pp GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(perm // {rpb} AS BIGINT) AS band,
              array_to_string(list_sort(list(minhash)), ',') AS band_sig
       FROM sig GROUP BY 1, 2),
ci AS (SELECT doc_id AS corpus_id, band, band_sig FROM bs
       WHERE doc_id % {batch_mod} <> 0),
bi AS (SELECT doc_id, band, band_sig FROM bs WHERE doc_id % {batch_mod} = 0),
hits AS (SELECT bi.doc_id, MIN(corpus_id) AS matched_id
         FROM bi JOIN ci USING (band, band_sig) GROUP BY 1)
SELECT d.doc_id, (matched_id IS NOT NULL) AS is_known_dup, matched_id
FROM (SELECT doc_id FROM documents WHERE doc_id % {batch_mod} = 0) d
LEFT JOIN hits USING (doc_id)"""


def quality_weighted_sample_sql(buckets: int = 1_000_000) -> str:
    """Twin of operators/sampling.quality_weighted_sample: integer 0..3
    quality indicator sum, per-source ppm rate via integer division,
    MINSTD bucket keep test."""
    toks = _TOKS.format(t="text")
    ltoks = _TOKS.format(t="lower(text)")
    n = f"len({toks})"
    sw_en = f"len(list_filter({ltoks}, t -> t IN {_in_list(STOPWORDS_EN)}))"
    sw_ratio = (
        f"(CASE WHEN {n} > 0 THEN CAST({sw_en} AS DOUBLE) / CAST({n} AS DOUBLE)"
        " ELSE 0.0 END)"
    )
    punct = "length(regexp_replace(text, '[^.,;:!?]', '', 'g'))"
    pr_ratio = (
        f"(CASE WHEN length(text) > 0 THEN CAST({punct} AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE) ELSE 0.0 END)"
    )
    ok3 = (
        f"((CASE WHEN {n} >= 10 AND {n} <= 5000 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {sw_ratio} >= 0.01 AND {sw_ratio} <= 0.6 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {pr_ratio} <= 0.2 THEN 1 ELSE 0 END))"
    )
    return f"""
WITH q AS (SELECT doc_id, source, {ok3} AS ok3 FROM documents),
r AS (SELECT source, (SUM(ok3) * {buckets}) // (3 * COUNT(*)) AS rate_ppm
      FROM q GROUP BY 1)
SELECT doc_id, source, rate_ppm::BIGINT AS rate_ppm,
       (((doc_id * 48271) % 2147483647) % {buckets}) < rate_ppm AS kept
FROM q JOIN r USING (source)"""


def chunk_documents_sql(ctx: int = 2048, stride: int | None = None) -> str:
    """Twin of operators/packing.chunk_documents: chunk starts via
    range over 1 + ceil(max(0, n - ctx) / stride), inclusive slicing."""
    if stride is None:
        stride = ctx
    toks = _TOKS.format(t="text")
    n_starts = (
        "CASE WHEN len(toks) > 0"
        f" THEN 1 + (greatest(len(toks) - {ctx}, 0) + {stride - 1}) // {stride}"
        " ELSE 0 END"
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
c AS (SELECT doc_id, i - 1 AS chunk_idx, (i - 1) * {stride} AS start_tok,
             least(len(toks) - (i - 1) * {stride}, {ctx}) AS n_tokens,
             array_to_string(
               toks[(i - 1) * {stride} + 1 : (i - 1) * {stride} + {ctx}],
               ' ') AS chunk_text
      FROM (SELECT doc_id, toks, unnest(range(1, ({n_starts}) + 1)) AS i
            FROM t))
SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_text FROM c"""


def prefix_jaccard_sql(threshold: float = 0.9) -> str:
    """Oracle for dedup.prefix_jaccard_pairs — deliberately the NAIVE
    every-token join (a different algorithm): the prefix filter is
    provably lossless, so both must produce identical pair sets."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents),
e AS (SELECT doc_id, len(toks) AS n_tok, unnest(toks) AS token
      FROM t WHERE len(toks) > 0),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_tok AS na, b.n_tok AS nb, COUNT(*) AS common
  FROM e a JOIN e b USING (token)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT doc_a, doc_b,
       ROUND(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
         AS jaccard
FROM pr
WHERE CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE) >= {threshold}"""


def semantic_dedup_sql(centroid_mod: int = 100, threshold: float = 0.92) -> str:
    """Oracle for similarity.semantic_dedup: same centroid scheme as
    ann_ivf_sql, then min-earlier-dominator within each cluster."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    pair_cos = f"({_DOT.format(a='va', b='vb')} / ({_NORM.format(a='va')} * {_NORM.format(a='vb')}))"
    return f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
               WHERE vec_id % {centroid_mod} = 1),
assigned AS (
  SELECT vid, v, centroid_id FROM (
    SELECT c.vec_id AS vid, c.embedding AS v, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, embedding FROM embeddings) c, cents)
  WHERE arank = 1),
doms AS (
  SELECT b.vid AS vid_b, MIN(a.vid) AS dup_of
  FROM assigned a JOIN assigned b USING (centroid_id),
       LATERAL (SELECT a.v AS va, b.v AS vb) x
  WHERE a.vid < b.vid AND {pair_cos} >= {threshold}
  GROUP BY b.vid)
SELECT assigned.vid AS vec_id, centroid_id, doms.dup_of,
       doms.dup_of IS NOT NULL AS is_duplicate
FROM assigned LEFT JOIN doms ON assigned.vid = doms.vid_b"""


def tfidf_topk_sql(queries=None, k: int = 5) -> str:
    """Twin of operators/retrieval.tfidf_topk. Same determinism contract
    as bm25_topk_sql: all float sums fold in term order; top-k cuts on
    the rounded score + doc_id tie-break."""
    from .operators.retrieval import DEFAULT_QUERIES, _query_terms

    pairs = _query_terms(DEFAULT_QUERIES if queries is None else queries)
    values = ", ".join(f"({qid}, '{t}')" for qid, t in pairs)
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
stats AS (SELECT COUNT(*) AS n_docs FROM base),
qt AS (SELECT * FROM (VALUES {values}) AS v(query_id, term)),
tf AS (
  SELECT b.doc_id, t.term, COUNT(*) AS tf
  FROM base b, UNNEST(b.toks) AS t(term)
  GROUP BY b.doc_id, t.term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
weights AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * (ln((s.n_docs + 1.0) / (d.df + 1.0)) + 1.0) AS w
  FROM tf JOIN dfq d ON tf.term = d.term CROSS JOIN stats s),
norms AS (
  SELECT doc_id, sqrt(list_sum(list(w * w ORDER BY term))) AS dnorm
  FROM weights GROUP BY doc_id),
qw AS (
  SELECT qt.query_id, qt.term,
         ln((s.n_docs + 1.0) / (COALESCE(d.df, 0) + 1.0)) + 1.0 AS qw
  FROM qt LEFT JOIN dfq d ON qt.term = d.term CROSS JOIN stats s),
qnorms AS (
  SELECT query_id, sqrt(list_sum(list(qw * qw ORDER BY term))) AS qnorm
  FROM qw GROUP BY query_id),
num AS (
  SELECT q.query_id, w.doc_id, list_sum(list(w.w * q.qw ORDER BY w.term)) AS dotp
  FROM weights w JOIN qw q ON w.term = q.term
  GROUP BY q.query_id, w.doc_id),
ranked AS (
  SELECT n.query_id, n.doc_id,
         ROUND(n.dotp / (norms.dnorm * qnorms.qnorm), 6) AS tfidf_cosine,
         ROW_NUMBER() OVER (PARTITION BY n.query_id
                            ORDER BY ROUND(n.dotp / (norms.dnorm * qnorms.qnorm), 6) DESC,
                                     n.doc_id) AS rank
  FROM num n JOIN norms ON n.doc_id = norms.doc_id
  JOIN qnorms ON n.query_id = qnorms.query_id)
SELECT query_id, doc_id, tfidf_cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


def semantic_probe_sql(
    batch_mod: int = 7, centroid_mod: int = 100, threshold: float = 0.3
) -> str:
    """Twin of similarity.semantic_index_probe over the corpus/batch
    split vec_id % batch_mod: corpus-derived centroids, nearest-centroid
    assignment on both sides, min matched corpus id per probe."""
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    pair_cos = f"({_DOT.format(a='pv', b='sv')} / ({_NORM.format(a='pv')} * {_NORM.format(a='sv')}))"
    return f"""
WITH corpus AS (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % {batch_mod} <> 0),
batch AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id % {batch_mod} = 0),
cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM corpus
          WHERE vec_id % {centroid_mod} = 1),
settled AS (
  SELECT vid AS corpus_id, v AS sv, centroid_id FROM (
    SELECT c.vec_id AS vid, c.embedding AS v, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM corpus c, cents)
  WHERE arank = 1),
probes AS (
  SELECT vid, v AS pv, centroid_id FROM (
    SELECT b.vec_id AS vid, b.embedding AS v, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM batch b, cents)
  WHERE arank = 1),
hits AS (
  SELECT p.vid, MIN(s.corpus_id) AS matched_id
  FROM probes p JOIN settled s USING (centroid_id)
  WHERE {pair_cos} >= {threshold}
  GROUP BY p.vid)
SELECT probes.vid AS vec_id, centroid_id,
       hits.matched_id IS NOT NULL AS is_known_dup, hits.matched_id
FROM probes LEFT JOIN hits ON probes.vid = hits.vid"""


# --- BPE pinned-golden oracles (VERDICT r3 "Next round" #1) ----------
#
# BPE induction is iterative, so no closed-form SQL exists; the synth
# corpus at each scale factor is deterministic, so the learned merges
# and per-doc tokenizations are fixed tables. tools/gen_bpe_oracle.py
# pins them from an INDEPENDENT pure-Python Sennrich (ACL'16)
# implementation (it never imports operators/bpe.py), keyed by a corpus
# signature (sum(length(text))) so one static SQL string selects the
# right pin at both the pytest scale (sf0.001) and the driver scale
# (sf0.01). A signature miss yields zero rows — loud, not silently
# green.

def _bpe_pins() -> dict:
    import json
    import pathlib

    p = pathlib.Path(__file__).parent / "resources" / "bpe_oracle.json"
    return json.loads(p.read_text())


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _bpe_signature_rows() -> list[tuple[int, dict]]:
    return [(int(pin["signature"]), pin) for pin in _bpe_pins().values()]


def bpe_merges_sql() -> str:
    rows = []
    for sig, pin in _bpe_signature_rows():
        for rank, l, r, merged, n in pin["merges"]:
            rows.append(
                f"({sig}, {rank}, {_sql_str(l)}, {_sql_str(r)}, "
                f"{_sql_str(merged)}, {n})"
            )
    values = ",\n".join(rows)
    return f"""
WITH sig AS (SELECT sum(length(text)) AS s FROM documents),
pinned(psig, rank, lft, rgt, merged, pair_count) AS (VALUES
{values})
SELECT CAST(rank AS INT) AS rank, lft AS "left", rgt AS "right",
       merged, CAST(pair_count AS BIGINT) AS pair_count
FROM pinned, sig WHERE pinned.psig = sig.s"""


def bpe_tokenize_sql() -> str:
    rows = []
    for sig, pin in _bpe_signature_rows():
        for doc_id, n_tokens, md5hex in pin["docs"]:
            rows.append(f"({sig}, {doc_id}, {n_tokens}, '{md5hex}')")
    values = ",\n".join(rows)
    return f"""
WITH sig AS (SELECT sum(length(text)) AS s FROM documents),
pinned(psig, doc_id, n_tokens, tokens_md5) AS (VALUES
{values})
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tokens AS INT) AS n_tokens,
       tokens_md5
FROM pinned, sig WHERE pinned.psig = sig.s"""


def ann_ivf_sq8_sql(
    k: int = 5, centroid_mod: int = 100, nprobe: int = 2, query_mod: int = 50
) -> str:
    """Twin of similarity.ivf_sq8_topk (FAISS IVF,SQ8 composed):
    full-precision list assignment + probes (ann_ivf_sql's shape),
    SQ8-reconstructed list payload + asymmetric scoring
    (ann_sq8_sql's recon)."""
    recon = (
        "list_transform(ce0, (x, i) -> CASE WHEN mx[i] > mn[i] "
        "THEN mn[i] + (FLOOR((CAST(x AS DOUBLE) - mn[i]) / (mx[i] - mn[i]) "
        "* 255.0 + 0.5) * (mx[i] - mn[i])) / 255.0 ELSE mn[i] END)"
    )
    cent_cos = f"({_DOT.format(a='v', b='cv')} / ({_NORM.format(a='v')} * {_NORM.format(a='cv')}))"
    cos = f"({_DOT.format(a='qe', b='ce')} / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}))"
    return f"""
WITH d AS (SELECT i AS pos, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
           FROM (SELECT unnest(embedding) AS x,
                        generate_subscripts(embedding, 1) AS i FROM embeddings)
           GROUP BY i),
st AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
          WHERE vec_id % {centroid_mod} = 1),
assigned0 AS (
  SELECT match_id, ce0, centroid_id FROM (
    SELECT c.vec_id AS match_id, c.embedding AS ce0, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS arank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings) c, cents)
  WHERE arank = 1),
assigned AS (SELECT match_id, {recon} AS ce, centroid_id FROM assigned0, st),
probes AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qe, cents.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ({cent_cos}) DESC, cents.centroid_id) AS prank
    FROM (SELECT vec_id, embedding, embedding AS v FROM embeddings
          WHERE vec_id % {query_mod} = 0) q, cents)
  WHERE prank <= {nprobe}),
s AS (SELECT query_id, match_id, {cos} AS cs
      FROM assigned JOIN probes USING (centroid_id)
      WHERE query_id <> match_id)
SELECT query_id, match_id, ROUND(cs, 6) AS cosine_sim, rank FROM (
  SELECT query_id, match_id, cs,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, match_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def decontaminate_spans_sql(n: int = 8, modulus: int = 17, residue: int = 3) -> str:
    """Twin of operators/dedup.decontaminate_spans with the benchmark
    carved as doc_id % modulus = residue (the registry convention):
    benchmark n-gram windows -> covered corpus token indices -> anti-join
    -> ordered reassembly. Output rows are the NON-benchmark docs only."""
    toks = _TOKS.format(t="lower(text)")
    return f"""
WITH t0 AS (SELECT doc_id, {toks} AS toks FROM documents),
t AS (SELECT * FROM t0 WHERE doc_id % {modulus} <> {residue}),
w AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+{n - 1}], ' ') AS win
      FROM (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS i
            FROM t)),
bw AS (SELECT DISTINCT array_to_string(toks[i:i+{n - 1}], ' ') AS win
       FROM (SELECT toks,
                    unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS i
             FROM t0 WHERE doc_id % {modulus} = {residue})),
cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + {n})) AS idx
        FROM w JOIN bw USING (win)),
ti AS (SELECT doc_id, i - 1 AS idx, toks[i] AS tok
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)),
kept AS (SELECT ti.doc_id, count(*) AS n_kept,
                string_agg(tok, ' ' ORDER BY idx) AS text_rewritten
         FROM ti ANTI JOIN cov ON ti.doc_id = cov.doc_id AND ti.idx = cov.idx
         GROUP BY 1)
SELECT t.doc_id, len(toks) AS n_tokens,
  (len(toks) - COALESCE(n_kept, 0))::BIGINT AS n_removed,
  COALESCE(text_rewritten, '') AS text_rewritten
FROM t LEFT JOIN kept USING (doc_id)"""

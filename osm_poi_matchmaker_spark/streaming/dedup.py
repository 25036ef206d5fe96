"""Streaming exact dedup over an append-only crawl.

A continuous crawl re-fetches the same pages (mirrors, redirects,
re-crawls), so the ingest edge needs dedup BEFORE the expensive
extract/match stages — the batch ``operators/dedup.exact_dedup`` runs
per release, this runs per micro-batch. (The reference's analogue is
the keyed get-or-create insert dedup, ``dao/data_handlers.py:220-312``,
which is inherently arrival-ordered — same idea, stream-shaped.)

Engine mechanics: ``dropDuplicatesWithinWatermark`` on the text hash
keeps the FIRST-arriving copy per key and holds per-key state only
until the event-time watermark passes, so state is bounded by (dedup
horizon × arrival rate), not by corpus size. The state key is the
16-byte md5 alone — at 10^12 docs and a 1-day horizon the store holds
one hash per *distinct* doc seen that day, sharded across executors by
the state-store partitioning; nothing ever scans the historical corpus.
Exact cross-release dedup (unbounded horizon) stays a batch job by
design — unbounded streaming state is the anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def exact_dedup_stream(
    spark: SparkSession,
    pages_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> None:
    """Append the first-arriving copy of every distinct ``text`` to
    ``out_dir``; duplicates arriving within ``watermark`` of event time
    (``warc_ts``) are dropped. availableNow trigger = batch-parity mode;
    a production stream drops the trigger and runs continuously,
    resuming from the streaming commit log in ``checkpoint_dir``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    deduped = (
        reader.parquet(pages_dir)
        .withColumn("text_hash", F.md5("text"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("text_hash")
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def band_structs_expr(text_col, n: int = 3, num_perm: int = 8, bands: int = 4):
    """Row-wise array of (band, band_sig) LSH bucket keys — the STATELESS
    twin of ``operators/dedup.band_signatures`` (same md5(perm|shingle)
    minhash, same sorted comma-join), computable on a stream without a
    shuffle aggregation: per-permutation min over shingles is
    ``array_min`` of a transformed array instead of a groupBy min, so
    the only stateful op in the stream stays the bucket claimer."""
    from ..operators.dedup import shingles

    sh = shingles(text_col, n)
    rpb = num_perm // bands

    def mh(perm: int):
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{perm}|"), s)))
        )

    structs = []
    for b in range(bands):
        sig = F.concat_ws(
            ",", F.array_sort(F.array(*[mh(b * rpb + r) for r in range(rpb)]))
        )
        structs.append(
            F.struct(F.lit(b).cast("long").alias("band"), sig.alias("band_sig"))
        )
    empty = F.array().cast("array<struct<band:bigint,band_sig:string>>")
    return F.when(F.size(sh) > 0, F.array(*structs)).otherwise(empty)


CLAIM_SCHEMA = "doc_id long, band long, band_sig string, owner long"


def lsh_dedup_stream(
    spark: SparkSession,
    pages_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "page_id",
    text: str = "text",
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming NEAR-dup dedup at the crawl edge: greedy LSH
    bucket-claiming. Each (band, band_sig) bucket is owned by its
    first-arriving doc (``applyInPandasWithState`` keyed on the bucket —
    ONE stateful op; the signatures are stateless row exprs); every
    arrival emits a claim row (doc_id, band, band_sig, owner) to
    ``out_dir``. :func:`claims_to_verdicts` collapses claims to the
    per-doc verdict, which equals ``operators/dedup.lsh_arrival_dedup``
    exactly when arrival order is monotone in the key (crawl page ids
    are).

    State is one long per DISTINCT bucket seen — bounded by content
    diversity, not corpus size (duplicates don't grow it), sharded by
    the state-store partitioning; a production deployment adds an
    event-time TTL to bound it by horizon like the exact variant above.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ex = (
        reader.parquet(pages_dir)
        .select(
            F.col(key).alias("doc_id"),
            F.explode(band_structs_expr(F.col(text), n, num_perm, bands)).alias("b"),
        )
        .select("doc_id", "b.band", "b.band_sig")
    )

    def kernel(bucket_key, pdfs, state):
        import pandas as pd

        rows = pd.concat(list(pdfs)).sort_values("doc_id")
        if state.exists:
            owner = int(state.get[0])
        else:
            # within a micro-batch, arrival order = the deterministic
            # doc_id sort (ids are monotone with arrival)
            owner = int(rows["doc_id"].iloc[0])
            state.update((owner,))
        out = rows[["doc_id"]].copy()
        out["band"] = bucket_key[0]
        out["band_sig"] = bucket_key[1]
        out["owner"] = owner
        yield out[["doc_id", "band", "band_sig", "owner"]]

    claims = ex.groupBy("band", "band_sig").applyInPandasWithState(
        kernel,
        outputStructType=CLAIM_SCHEMA,
        stateStructType="owner long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        claims.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def claims_to_verdicts(docs, claims, key: str = "doc_id"):
    """Collapse streamed bucket claims to the per-doc verdict
    (doc_id, dup_of, is_duplicate) — the same rollup as the tail of
    ``operators/dedup.lsh_arrival_dedup``; docs with no claims (too
    short for shingles) survive."""
    v = claims.groupBy("doc_id").agg(
        F.min(
            F.when(F.col("owner") != F.col("doc_id"), F.col("owner"))
        ).alias("dup_src"),
        F.max(F.col("owner") != F.col("doc_id")).alias("isd"),
    )
    return (
        docs.select(F.col(key).alias("doc_id"))
        .join(v, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_src", F.col("doc_id")).alias("dup_of"),
            F.coalesce("isd", F.lit(False)).alias("is_duplicate"),
        )
    )


def index_probe_stream(
    spark: SparkSession,
    batch_dir: str,
    schema,
    corpus,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming twin of ``operators/dedup.lsh_index_probe``: incoming
    docs probe a STATIC settled-corpus LSH index at the crawl edge,
    with ZERO streaming state.

    The trick that removes all state: the static index is pre-reduced
    to one row per bucket carrying ``min(corpus_id)``, and the stream
    side takes one stream-static LEFT join per band (band fixed per
    join, so the key is just the band signature) instead of exploding
    buckets and re-aggregating per doc — ``least()`` over the per-band
    matches equals the batch op's min over all matching bucket rows.
    No watermark, no aggregation, no dropDuplicates: every arriving doc
    emits exactly one verdict row, immediately.

    Each micro-batch re-probes the same static snapshot of ``corpus``;
    refreshing the index is a restart (the settled corpus changes per
    release, not per micro-batch).
    """
    from ..operators.dedup import band_signatures

    idx = (
        band_signatures(corpus, key, text, n, num_perm, bands)
        .groupBy("band", "band_sig")
        .agg(F.min(key).alias("matched_id"))
        .persist()
    )
    idx.count()  # materialize once; every micro-batch reuses the cache

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    s = reader.parquet(batch_dir).withColumn(
        "_bs", band_structs_expr(F.col(text), n, num_perm, bands)
    )
    for b in range(bands):
        side = (
            idx.where(F.col("band") == b)
            .select(
                F.col("band_sig").alias(f"_sig{b}"),
                F.col("matched_id").alias(f"_m{b}"),
            )
        )
        s = s.withColumn(
            f"_sig{b}", F.element_at("_bs", b + 1)["band_sig"]
        ).join(F.broadcast(side), f"_sig{b}", "left")
    matched = F.least(*[F.col(f"_m{b}") for b in range(bands)])
    out = s.select(
        F.col(key),
        matched.isNotNull().alias("is_known_dup"),
        matched.alias("matched_id"),
    )
    (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    idx.unpersist()

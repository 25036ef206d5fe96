"""operators/packing unit tests: hand-computed concat-then-chunk spans
and two-phase == single-window equivalence across bucket sizes."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from osm_poi_matchmaker_spark.functions.textstats import token_count
from osm_poi_matchmaker_spark.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_hand_computed(spark):
    # ctx=4; token counts: 3, 3, 5, 0, 2 -> offsets 0, 3, 6, 11, 11
    docs = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "d e f"),
            (3, "g h i j k"),
            (4, ""),
            (5, "l m"),
        ],
    )
    got = {r["doc_id"]: r for r in pack_sequences(docs, ctx=4).collect()}
    # doc 1: off 0, bins 0..0
    assert (got[1]["global_offset"], got[1]["bin_first"], got[1]["bin_last"]) == (0, 0, 0)
    # doc 2: off 3, tokens 3..5 -> bins 0..1, spans 2, starts at slot 3
    assert (got[2]["global_offset"], got[2]["bin_first"], got[2]["bin_last"]) == (3, 0, 1)
    assert got[2]["bin_offset"] == 3 and got[2]["n_bins_spanned"] == 2
    # doc 3: off 6, tokens 6..10 -> bins 1..2
    assert (got[3]["bin_first"], got[3]["bin_last"]) == (1, 2)
    # empty doc: occupies only its offset's bin
    assert (got[4]["global_offset"], got[4]["n_tokens"]) == (11, 0)
    assert got[4]["bin_first"] == got[4]["bin_last"] == 2
    # doc 5: off 11, tokens 11..12 -> bins 2..3
    assert (got[5]["bin_first"], got[5]["bin_last"]) == (2, 3)


def test_two_phase_equals_single_window(spark):
    docs = _docs(
        spark, [(i * 7 % 997, " ".join(["w"] * (i % 13))) for i in range(200)]
    )
    single = docs.select(
        F.col("doc_id"), token_count(F.col("text")).alias("n")
    ).withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    want = {r["doc_id"]: r["off"] for r in single.collect()}
    for shift in (2, 8, 40):  # 40 -> one bucket (degenerate single-window)
        got = {
            r["doc_id"]: r["global_offset"]
            for r in pack_sequences(docs, ctx=512, bucket_shift=shift).collect()
        }
        assert got == want, shift


def test_chunk_documents_windows_and_tail(spark):
    """ctx=4, stride=2 over a 9-token doc: 1 + ceil(5/2) = 4 starts
    (0,2,4,6) — the last chunk reaches the end, and no start is emitted
    once the previous chunk already covered the tail. A 3-token doc
    yields one chunk; an empty doc none."""
    from osm_poi_matchmaker_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),
            (2, "x y z"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, ctx=4, stride=2).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in out
    }
    assert got[(1, 0)] == (0, 4, "a b c d")
    assert got[(1, 1)] == (2, 4, "c d e f")
    assert got[(1, 2)] == (4, 4, "e f g h")
    assert got[(1, 3)] == (6, 3, "g h i")
    assert (1, 4) not in got  # tail already covered by chunk 3
    assert got[(2, 0)] == (0, 3, "x y z")
    assert (2, 1) not in got
    assert (3, 0) not in got
    assert len(got) == 5

    # stride == ctx (default) -> disjoint cover, token-exact
    cover = chunk_documents(docs, ctx=4).collect()
    doc1 = sorted(
        (r["chunk_idx"], r["chunk_text"]) for r in cover if r["doc_id"] == 1
    )
    assert doc1 == [(0, "a b c d"), (1, "e f g h"), (2, "i")]

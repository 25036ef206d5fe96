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

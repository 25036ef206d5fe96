"""Multimodal (image/audio/video) columns: schema + mapInPandas plumbing.

Media travels as opaque ``binary`` columns with typed metadata structs;
decode / resize / frame-sample / feature-extract run as Arrow-batched
``mapInPandas`` stages. The actual codec calls are STUBBED behind
:func:`_decode_stub` (no image/audio libraries in this environment —
clearly marked); everything Spark-side — schemas, batch iteration,
partitioning behavior, deterministic feature output — is real and tested.

At 100 TB the asset table is partitioned by (kind, size-bucket) so decode
stages are skew-balanced; features append as ``array<float>`` columns that
feed operators/similarity.py directly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB — stands in for a real codec (PIL/librosa/ffmpeg are not
    installed here). Deterministic fake decode: md5 of the payload seeds a
    fixed-dim pseudo-pixel vector. Replace with the real decoder on a
    production cluster; the Spark plumbing around it does not change.
    """
    digest = hashlib.md5(payload).digest()
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(FEATURE_DIM / seed.shape[0])) or 1
    return np.tile(seed, reps)[:FEATURE_DIM] / 255.0


def synth_assets(pages: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from pages (payload = html
    bytes; kind cycles image/audio/video; meta from arithmetic)."""
    k = F.col("page_id")
    return pages.select(
        k.alias("asset_id"),
        F.when(k % 3 == 0, "image").when(k % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            (F.lit(64) + k % 512).cast("int").alias("width"),
            (F.lit(64) + (k * 7) % 512).cast("int").alias("height"),
            F.when(k % 3 == 1, 16000).cast("int").alias("sample_rate"),
            F.when(k % 3 == 2, (24 + k % 100).cast("int")).alias("n_frames"),
        ).alias("meta"),
    )


def decode_and_featurize(assets: DataFrame) -> DataFrame:
    """mapInPandas decode+feature stage: binary payload → fixed-dim
    float32 feature vector + normalized dimensions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p if isinstance(p, (bytes, bytearray)) else bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            meta = pdf["meta"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "width": [m["width"] if m is not None else None for m in meta],
                    "height": [m["height"] if m is not None else None for m in meta],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(assets: DataFrame, every_nth: int = 8) -> DataFrame:
    """Video frame sampling as plan-level explode: one row per sampled
    frame index (the decode of each frame would slot into a subsequent
    mapInPandas exactly like decode_and_featurize)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_nth)
    )
    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )

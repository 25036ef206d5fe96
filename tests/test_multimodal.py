"""Multimodal plumbing tests: schema shape, deterministic stub features,
frame-sampling explode arithmetic."""

from __future__ import annotations

from osm_poi_matchmaker_spark import synth
from osm_poi_matchmaker_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_and_featurize,
    frame_sample,
    synth_assets,
)

SF = "/root/testdata/sf0.001"


def test_decode_features_deterministic(spark):
    assets = synth_assets(synth.pages(spark, SF)).limit(20)
    a = {r["asset_id"]: r["feature"] for r in decode_and_featurize(assets).collect()}
    b = {r["asset_id"]: r["feature"] for r in decode_and_featurize(assets).collect()}
    assert a == b
    vec = next(iter(a.values()))
    assert len(vec) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in vec)


def test_decode_schema(spark):
    out = decode_and_featurize(synth_assets(synth.pages(spark, SF)).limit(5))
    assert [f.name for f in out.schema] == ["asset_id", "kind", "width", "height", "feature"]
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["width"] is not None for r in rows)


def test_frame_sample_counts(spark):
    assets = synth_assets(synth.pages(spark, SF))
    videos = {r["asset_id"]: r["meta"]["n_frames"] for r in assets.where("kind = 'video'").collect()}
    counts = (
        frame_sample(assets, every_nth=8)
        .groupBy("asset_id")
        .count()
        .collect()
    )
    for r in counts:
        n_frames = videos[r["asset_id"]]
        expected = (max(n_frames - 1, 0)) // 8 + 1
        assert r["count"] == expected


def test_codec_roundtrips_and_png_filters():
    """REAL codecs: PNG encode/decode round-trip (gray + RGB), WAV via
    stdlib wave, the OPMV frame container, and the decoder's handling of
    ALL five PNG scanline filters (hand-built filtered streams)."""
    import struct
    import zlib

    import numpy as np

    from osm_poi_matchmaker_spark.operators import multimodal as mm

    for a in (0, 7, 12345):
        px = mm._image_pixels(a)
        assert (mm.decode_png(mm.encode_png(px)) == px).all()
        rgb = np.stack([px, px // 2, px // 3], axis=2)
        assert (mm.decode_png(mm.encode_png(rgb)) == rgb).all()
        s = mm._audio_samples(a)
        d, rate = mm.decode_wav(mm.encode_wav(s))
        assert rate == 16000 and (d == s).all()
        frames = [mm._image_pixels(a, f) for f in range(4)]
        out = mm.decode_video(mm.encode_video(frames))
        assert all((o == f).all() for o, f in zip(out, frames))

    # closed-form feature checks (exact dyadic, zero tolerance)
    a, k = 12346, 5  # even id: the PNG image leg (odd ids take the JPEG leg)
    bx, by = k % 4, k // 4
    f_img, _ = mm.featurize_media("image", mm.media_payload(a, "image"))
    exp = sum(
        (a * 31 + (4 * bx + dx) * 7 + (4 * by + dy) * 13) % 256
        for dx in range(4) for dy in range(4)
    ) / 16
    assert f_img[k] == np.float32(exp)
    f_aud, _ = mm.featurize_media("audio", mm.media_payload(a, "audio"))
    exp = sum(
        (((a * 13 + (k * 128 + j) * 17) % 256) - 128) ** 2 for j in range(128)
    ) / 128
    assert f_aud[k] == np.float32(exp)

    # decoder must reverse Sub/Up/Average/Paeth, not just our filter-0 writes
    def manual_png(px, ftypes):
        h, w = px.shape
        rows, prev = [], np.zeros(w, dtype=np.int16)
        for y in range(h):
            ft = ftypes[y % len(ftypes)]
            row = px[y].astype(np.int16)
            enc = row.copy()
            for i in range(w):
                left = int(row[i - 1]) if i else 0
                up = int(prev[i])
                ul = int(prev[i - 1]) if i else 0
                if ft == 1:
                    enc[i] = (row[i] - left) % 256
                elif ft == 2:
                    enc[i] = (row[i] - up) % 256
                elif ft == 3:
                    enc[i] = (row[i] - ((left + up) >> 1)) % 256
                elif ft == 4:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul)
                    enc[i] = (row[i] - pred) % 256
            rows.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (mm._PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + mm._png_chunk(b"IEND", b""))

    px = mm._image_pixels(99)
    for fts in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (mm.decode_png(manual_png(px, fts)) == px).all(), fts

    # non-OPMV video containers are explicitly not decodable here
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_video(b"\x00\x00\x00\x18ftypmp42fake-mp4-header")


# --- round-3 JPEG leg --------------------------------------------------------


def test_jpeg_constant_blocks_exact():
    """Constant 8x8 blocks survive baseline JPEG bit-exactly (DC-only,
    flat quant) — the property the asset_decode_real oracle relies on."""
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_pixels,
        decode_jpeg,
        encode_jpeg,
    )

    for aid in (3, 9, 15, 21, 1001):
        px = _jpeg_pixels(aid)
        assert np.array_equal(decode_jpeg(encode_jpeg(px)), px)


def test_jpeg_arbitrary_near_lossless():
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(px))
    assert back.shape == px.shape
    err = np.abs(px.astype(int) - back.astype(int))
    assert err.max() <= 1  # flat quant: rounding error only
    assert encode_jpeg(px) == encode_jpeg(px)  # deterministic bytes


def test_jpeg_unsupported_variants_raise():
    import numpy as np
    import pytest as _pytest

    from osm_poi_matchmaker_spark.operators.multimodal import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # flip SOF0 (0xC0) to SOF2 (progressive, 0xC2)
    i = bytes(data).find(b"\xff\xc0")
    prog = bytes(data[:i + 1]) + b"\xc2" + bytes(data[i + 2:])
    with _pytest.raises(NotImplementedError):
        decode_jpeg(prog)
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_featurize_image_sniffs_jpeg_vs_png():
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_pixels,
        featurize_media,
        media_payload,
    )

    # odd image id -> JPEG payload, feature = the four block constants
    feat, meta = featurize_media("image", media_payload(3, "image"))
    px = _jpeg_pixels(3)
    want = px.reshape(4, 4, 4, 4).sum(axis=(1, 3)).reshape(16) / 16.0
    assert np.allclose(feat, want) and meta == {"width": 16, "height": 16}
    # even image id still decodes the PNG leg
    feat2, meta2 = featurize_media("image", media_payload(6, "image"))
    assert meta2 == {"width": 16, "height": 16} and len(feat2) == 16

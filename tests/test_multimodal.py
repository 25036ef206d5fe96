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


# --- round-4: 3-component 4:2:0 color JPEG ---------------------------

def test_jpeg_color_constant_mcu_exact():
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_color_pixels,
        decode_jpeg_color,
        encode_jpeg_color,
        ycc_forward,
        ycc_inverse,
    )

    for a in (0, 1, 7, 123, 250):
        rgb = _jpeg_color_pixels(a)
        dec = decode_jpeg_color(encode_jpeg_color(rgb))
        # exact = the integer forward+inverse transform of the fixture
        # (the lossy stages are all identities on MCU-constant content)
        assert np.array_equal(dec, ycc_inverse(ycc_forward(rgb))), a
        assert encode_jpeg_color(rgb) == encode_jpeg_color(rgb)


def test_jpeg_color_luma_fidelity_and_chroma_subsampling():
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import (
        decode_jpeg_color,
        encode_jpeg_color,
        ycc_forward,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    dec = decode_jpeg_color(encode_jpeg_color(rgb))
    assert dec.shape == rgb.shape
    # luma survives flat quant on pure noise; per-pixel chroma does not
    # (4:2:0 averages 2×2 neighborhoods) — that asymmetry IS 4:2:0
    y_err = np.abs(ycc_forward(rgb)[..., 0] - ycc_forward(dec)[..., 0]).max()
    assert y_err <= 16
    # chroma-flat content (R=G=B) round-trips tightly despite subsampling
    g = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    dec2 = decode_jpeg_color(encode_jpeg_color(img))
    assert np.abs(dec2.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_color_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from osm_poi_matchmaker_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_color,
        encode_jpeg,
        encode_jpeg_color,
    )

    rgb = np.zeros((32, 32, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_color(rgb))
    # flip the Y sampling byte 0x22 -> 0x12 ((1,2) vertical-only
    # subsampling): a layout outside the supported 420/422/444 set
    i = bytes(data).find(b"\xff\xc0")
    assert data[i + 11] == 0x22  # SOF0 body: len(2) prec(1) h(2) w(2) n(1) id(1) samp
    data[i + 11] = 0x12
    with _pytest.raises(NotImplementedError):
        decode_jpeg_color(bytes(data))
    with _pytest.raises(NotImplementedError):
        encode_jpeg_color(rgb, sampling="411")
    # gray stream into the color decoder and vice versa: loud, not wrong
    with _pytest.raises(NotImplementedError):
        decode_jpeg_color(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    with _pytest.raises(NotImplementedError):
        decode_jpeg(encode_jpeg_color(rgb))
    with _pytest.raises(NotImplementedError):
        encode_jpeg_color(np.zeros((24, 24, 3), dtype=np.uint8))  # not /16


def test_color_decode_values_spark(spark):
    import numpy as np

    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_color_pixels,
        color_decode_values,
        ycc_forward,
        ycc_inverse,
    )

    pages = spark.createDataFrame([(i,) for i in range(6)], ["page_id"])
    got = {
        (r["asset_id"], r["channel"], r["mcu"]): r["val"]
        for r in color_decode_values(pages).collect()
    }
    assert len(got) == 6 * 3 * 4
    for a in range(6):
        want = ycc_inverse(ycc_forward(_jpeg_color_pixels(a)))
        for mi in range(2):
            for mj in range(2):
                for c in range(3):
                    assert got[(a, c, mi * 2 + mj)] == int(want[mi * 16, mj * 16, c])


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn support (round 4): restart intervals produce identical
    decoded pixels (predictor resets + byte alignment are lossless
    bookkeeping), the markers really appear in the stream, and a
    corrupted restart sequence fails loudly."""
    import numpy as np
    import pytest as _pytest

    from osm_poi_matchmaker_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_color,
        encode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    ref = decode_jpeg(encode_jpeg(g))
    for ri in (1, 2, 7):
        data = encode_jpeg(g, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI segment present
        assert np.array_equal(decode_jpeg(data), ref)
    rgb = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    cref = decode_jpeg_color(encode_jpeg_color(rgb))
    for ri in (1, 3):
        assert np.array_equal(
            decode_jpeg_color(encode_jpeg_color(rgb, restart_interval=ri)), cref
        )
    # RST indices cycle mod 8: force >8 restarts
    tall = rng.randint(0, 256, (8, 8 * 20)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(tall, restart_interval=1)),
        decode_jpeg(encode_jpeg(tall)),
    )
    # tamper with the first RST marker id -> loud failure
    data = bytearray(encode_jpeg(g, restart_interval=1))
    i = bytes(data).find(b"\xff\xd0")
    assert i > 0
    data[i + 1] = 0xD5  # wrong sequence number
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_jpeg_color_sampling_layouts():
    """4:2:2 and 4:4:4 alongside 4:2:0 (round 5): MCU-constant fixtures
    round-trip bit-exactly in every layout (with and without restart
    markers), the SOF sampling byte matches the layout, and MCU-size
    divisibility is enforced per layout."""
    import numpy as np
    import pytest as _pytest

    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_color_pixels,
        decode_jpeg_color,
        encode_jpeg_color,
        ycc_forward,
        ycc_inverse,
    )

    px = _jpeg_color_pixels(9)
    # The decode contract is exactness up to the fixed-point color
    # transform round trip (±1 on some constants) — same comparison the
    # asset_decode_color oracle makes.
    want = ycc_inverse(ycc_forward(px))
    sof_samp = {"420": 0x22, "422": 0x21, "444": 0x11}
    for layout in ("420", "422", "444"):
        for ri in (0, 1, 3):
            data = encode_jpeg_color(px, restart_interval=ri, sampling=layout)
            i = data.find(b"\xff\xc0")
            assert data[i + 11] == sof_samp[layout]
            out = decode_jpeg_color(data)
            assert (out == want).all(), (layout, ri)
    # streams genuinely differ per layout
    streams = {
        layout: encode_jpeg_color(px, sampling=layout)
        for layout in ("420", "422", "444")
    }
    assert len(set(streams.values())) == 3
    # 4:4:4 on non-constant content: only DCT rounding error remains
    rng_img = (
        np.arange(32 * 48 * 3, dtype=np.int64) * 2654435761 % 256
    ).reshape(32, 48, 3).astype(np.uint8)
    out = decode_jpeg_color(encode_jpeg_color(rng_img, sampling="444"))
    assert np.abs(out.astype(int) - rng_img.astype(int)).max() <= 8
    # divisibility per layout: 24x24 is whole 8x8 MCUs (444) but not 16x8
    ok = np.zeros((24, 24, 3), dtype=np.uint8)
    decode_jpeg_color(encode_jpeg_color(ok, sampling="444"))
    with _pytest.raises(NotImplementedError):
        encode_jpeg_color(ok, sampling="422")
    with _pytest.raises(NotImplementedError):
        encode_jpeg_color(ok, sampling="420")


def test_color_layout_values_spark(spark):
    from osm_poi_matchmaker_spark.operators.multimodal import (
        _jpeg_color_pixels,
        color_layout_values,
        ycc_forward,
        ycc_inverse,
    )

    pages = spark.createDataFrame([(i,) for i in range(4)], ["page_id"])
    got = {
        (r["asset_id"], r["layout"], r["channel"], r["mcu"]): r["val"]
        for r in color_layout_values(pages).collect()
    }
    assert len(got) == 4 * 3 * 3 * 4
    for a in range(4):
        want = ycc_inverse(ycc_forward(_jpeg_color_pixels(a)))
        for layout in ("420", "422", "444"):
            for mi in range(2):
                for mj in range(2):
                    for c in range(3):
                        assert (
                            got[(a, layout, c, mi * 2 + mj)]
                            == int(want[mi * 16, mj * 16, c])
                        )

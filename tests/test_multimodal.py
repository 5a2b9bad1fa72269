"""Multimodal plumbing: schema, deterministic stub features, explode-shaped
frame sampling, NotImplementedError gate for real decoding."""

from __future__ import annotations

import numpy as np
import pytest

from baguetter_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    _decode_stub,
    frame_sample,
    media_features,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        ("m1", "image", bytes(range(64)), ("image/png", 8, 8, None)),
        ("m2", "audio", b"\x01\x02" * 100, ("audio/wav", None, None, 1200)),
        ("m3", "video", b"\xff" * 4096, ("video/mp4", 64, 64, 90000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_stub_features_deterministic(spark, media_df):
    out1 = {r["media_id"]: r["feature"] for r in media_features(media_df, allow_stub=True).collect()}
    out2 = {r["media_id"]: r["feature"] for r in media_features(media_df, allow_stub=True).collect()}
    assert out1.keys() == {"m1", "m2", "m3"}
    for k in out1:
        assert len(out1[k]) == FEATURE_DIM
        assert out1[k] == out2[k]
        assert abs(float(np.linalg.norm(out1[k])) - 1.0) < 1e-5


def test_real_decode_gated(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        media_features(media_df, allow_stub=False).collect()


def test_frame_sample_explodes(spark, media_df):
    rows = frame_sample(media_df, every_n_bytes=1024, allow_stub=True).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_no"])
    assert sorted(per["m3"]) == [0, 1, 2, 3]  # 4096 bytes / 1024
    assert per["m1"] == [0]


def test_stub_is_pure_function():
    a = _decode_stub(b"abc", "image")
    b = _decode_stub(b"abc", "image")
    c = _decode_stub(b"abd", "image")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


# --- real decoders (round 4): pure-numpy netpbm + PCM WAV --------------------

from baguetter_spark.operators.multimodal import (  # noqa: E402
    decode_ppm,
    decode_wav,
    media_decode_stats,
)


def _ppm(w, h, px, magic=b"P6", header_extra=b""):
    return magic + b"\n" + header_extra + b"%d %d\n255\n" % (w, h) + bytes(px)


def _wav(samples, rate=8000, bits=16, channels=1, audio_format=1):
    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
        block = 2 * channels
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
        block = channels
    fmt = (
        audio_format.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def test_decode_ppm_roundtrip():
    px = list(range(2 * 3 * 3))  # 2x3 P6
    w, h, maxval, arr = decode_ppm(_ppm(2, 3, px))
    assert (w, h, maxval) == (2, 3, 255)
    assert arr.tolist() == px


def test_decode_ppm_comment_and_pgm():
    px = [7] * 6
    w, h, _, arr = decode_ppm(_ppm(3, 2, px, magic=b"P5", header_extra=b"# c\n"))
    assert (w, h) == (3, 2)
    assert arr.tolist() == px


def test_decode_ppm_errors():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P3\n1 1\n255\n abc")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(_ppm(4, 4, [0] * 10))  # raster short of 48 bytes


def test_decode_wav_roundtrip():
    samples = [0, 100, -100, 32767, -32768]
    rate, ch, arr = decode_wav(_wav(samples, rate=44100))
    assert (rate, ch) == (44100, 1)
    assert arr.tolist() == samples


def test_decode_wav_8bit_and_errors():
    rate, ch, arr = decode_wav(_wav([-128, 0, 127], bits=8))
    assert arr.tolist() == [-128, 0, 127]
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(_wav([0], audio_format=3))  # IEEE float tag


def test_media_features_real_decode(spark):
    rows = [
        ("img", "image", _ppm(4, 4, list(range(48))), None),
        ("aud", "audio", _wav(list(range(-50, 50))), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in media_features(df, allow_stub=False).collect()}
    for k in ("img", "aud"):
        feat = out[k]["feature"]
        assert len(feat) == FEATURE_DIM
        assert abs(float(np.linalg.norm(feat)) - 1.0) < 1e-5
    # feature is a function of decoded content: same pixels, different
    # header spacing -> identical feature
    alt = spark.createDataFrame(
        [("img2", "image", _ppm(4, 4, list(range(48)), header_extra=b"# x\n"), None)],
        MEDIA_SCHEMA,
    )
    feat2 = media_features(alt, allow_stub=False).collect()[0]["feature"]
    assert feat2 == out["img"]["feature"]


def test_media_decode_stats(spark):
    px = list(range(48))
    samples = list(range(-50, 50))
    rows = [
        ("img", "image", _ppm(4, 4, px), None),
        ("aud", "audio", _wav(samples, rate=16000), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in media_decode_stats(df).collect()}
    img = out["img"]
    assert (img["format"], img["width"], img["height"]) == ("ppm", 4, 4)
    assert img["n_samples"] == 48 and img["sample_sum"] == sum(px)
    aud = out["aud"]
    assert (aud["format"], aud["sample_rate"], aud["n_channels"]) == ("wav", 16000, 1)
    assert aud["n_samples"] == 100 and aud["sample_sum"] == sum(samples)


# ---------------------------------------------------------------- PNG (r5)


def _hand_png(width, height, channels, rows_filtered):
    """Assemble a PNG byte-by-byte WITHOUT encode_png, so decode_png is
    verified against the spec, not against our own encoder's inverse.
    ``rows_filtered`` = [(filter_type, [filtered bytes...]), ...]."""
    import zlib

    from baguetter_spark.operators.multimodal import PNG_MAGIC

    color_type = {1: 0, 3: 2, 2: 4, 4: 6}[channels]

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    raw = b"".join(bytes([ft]) + bytes(row) for ft, row in rows_filtered)
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_decode_png_hand_vectors():
    """Every filter type against hand-computed reconstructions (PNG spec
    §6; bpp = 3 for RGB).  a = left recon, b = above, c = upper-left."""
    from baguetter_spark.operators.multimodal import decode_png

    # 3x2 RGB.  Row 0 filter=1 (Sub): recon[i] = filt[i] + recon[i-3]
    #   filt [10,20,30, 5,5,5, 1,2,3] -> recon [10,20,30, 15,25,35, 16,27,38]
    # Row 1 filter=4 (Paeth): first pixel a=0,c=0 -> pred=b (above)
    #   filt [1,1,1, 2,2,2, 250,0,0] over prior row:
    #   i=0..2: pred=b=[10,20,30] -> [11,21,31]
    #   i=3..5: a=[11,21,31], b=[15,25,35], c=[10,20,30];
    #           p=a+b-c=[16,26,36]; pa=5,pb=1,pc=6 each -> pred=b -> [17,27,37]
    #   i=6..8: a=[17,27,37], b=[16,27,38], c=[15,25,35];
    #           i=6: p=18,pa=1,pb=2,pc=3 -> a=17 -> (250+17)&255 = 11
    #           i=7: p=29,pa=2,pb=2,pc=4 -> a=27 -> (0+27) = 27
    #           i=8: p=40,pa=3,pb=2,pc=5 -> b=38 -> (0+38) = 38
    payload = _hand_png(3, 2, 3, [
        (1, [10, 20, 30, 5, 5, 5, 1, 2, 3]),
        (4, [1, 1, 1, 2, 2, 2, 250, 0, 0]),
    ])
    w, h, ch, px = decode_png(payload)
    assert (w, h, ch) == (3, 2, 3)
    assert px.tolist() == [10, 20, 30, 15, 25, 35, 16, 27, 38,
                           11, 21, 31, 17, 27, 37, 11, 27, 38]

    # 2x3 gray: None, Up, Average rows
    #   row0 f=0: [100, 200]
    #   row1 f=2 (Up): filt [60, 70] -> [160, (200+70)&255=14]
    #   row2 f=3 (Avg): filt [8, 9]; i=0: a=0,prior=160 -> 8+80=88;
    #                   i=1 (bpp=1 so a=88): (88+14)>>1=51 -> 9+51=60
    payload2 = _hand_png(2, 3, 1, [(0, [100, 200]), (2, [60, 70]), (3, [8, 9])])
    w, h, ch, px = decode_png(payload2)
    assert (w, h, ch) == (2, 3, 1)
    assert px.tolist() == [100, 200, 160, 14, 88, 60]


def test_encode_decode_png_roundtrip_all_color_types():
    import numpy as np

    from baguetter_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        w, h = 5, 7  # h >= 5: the encoder's row%5 cycle hits every filter
        px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8)
        got = decode_png(encode_png(px, w, h, ch))
        assert got[:3] == (w, h, ch)
        assert np.array_equal(got[3], px)


def test_decode_png_errors():
    import numpy as np
    import pytest

    from baguetter_spark.operators.multimodal import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + bytes(40))
    good = encode_png(np.arange(12, dtype=np.uint8), 2, 2, 3)
    # corrupt IHDR: interlace byte -> 1 (Adam7 unsupported)
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(bytes(bad))
    # palette color type
    bad = bytearray(good)
    bad[8 + 8 + 9] = 3
    with pytest.raises(ValueError, match="color type"):
        decode_png(bytes(bad))
    # truncated raster (shorter IDAT payload than h*(1+stride))
    with pytest.raises(ValueError, match="mismatch"):
        decode_png(_hand_png(3, 2, 3, [(0, [0] * 9)]))


def test_media_decode_stats_png(spark):
    import numpy as np

    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        media_decode_stats,
        media_features,
    )

    px = np.arange(60, dtype=np.uint8)  # 5x4 gray... no: 5*4*3 RGB = 60
    rows = [("png1", "image", encode_png(px, 5, 4, 3), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = media_decode_stats(df).collect()[0]
    assert (out["format"], out["width"], out["height"], out["n_channels"]) == (
        "png", 5, 4, 3)
    assert out["n_samples"] == 60 and out["sample_sum"] == int(px.sum())
    feat = media_features(df, allow_stub=False).collect()[0]["feature"]
    assert len(feat) == 16

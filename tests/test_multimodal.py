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

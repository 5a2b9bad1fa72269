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

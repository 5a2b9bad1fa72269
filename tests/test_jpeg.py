"""Baseline JPEG codec (operators/jpeg.py): exactness in the DC-only
regime (what the gate row relies on), bounded roundtrip error in the
lossy regimes, marker/error handling, and the Spark decode-stats path."""

from __future__ import annotations

import numpy as np
import pytest

from baguetter_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _block_constant(w, h, seed=3):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = int(rng.integers(0, 256))
    return img


def test_block_constant_gray_is_integer_exact():
    """Unit quant tables + constant 8x8 blocks -> one integer DC per
    block, zero ACs: the lossy codec becomes exact (the gate-row regime)."""
    img = _block_constant(24, 16)
    w, h, ch, px = decode_jpeg(encode_jpeg(img.reshape(-1), 24, 16, 1))
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(px, img.reshape(-1))


def test_random_gray_roundtrip_bounded():
    """Unit quant tables bound coefficient rounding at 0.5, so spatial
    error stays within +-2 on arbitrary content (observed +-1)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg(img.reshape(-1), 24, 16, 1))
    assert (w, h, ch) == (24, 16, 1)
    assert np.abs(px.astype(int) - img.reshape(-1).astype(int)).max() <= 2


def test_rgb_444_roundtrip_bounded():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg(img.reshape(-1), 16, 8, 3))
    assert (w, h, ch) == (16, 8, 3)
    assert np.abs(px.astype(int) - img.reshape(-1).astype(int)).max() <= 2


def test_constant_color_420_subsampling():
    """2x2 chroma averaging is lossless on constant color; exercises the
    sampling-factor MCU layout + nearest upsampling path."""
    img = np.full((20, 12, 3), (90, 160, 40), dtype=np.uint8)
    w, h, ch, px = decode_jpeg(
        encode_jpeg(img.reshape(-1), 12, 20, 3, subsample_420=True)
    )
    assert (w, h, ch) == (12, 20, 3)
    assert np.abs(px.astype(int) - img.reshape(-1).astype(int)).max() <= 1


def test_non_block_aligned_dimensions():
    """11x13: edge blocks pad by replication and the decoder crops —
    interior pixels still roundtrip within the lossy bound."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
    w, h, ch, px = decode_jpeg(encode_jpeg(img.reshape(-1), 13, 11, 1))
    assert (w, h, ch) == (13, 11, 1)
    assert np.abs(px.astype(int) - img.reshape(-1).astype(int)).max() <= 2


def test_errors_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope" + bytes(20))
    good = bytearray(encode_jpeg(_block_constant(8, 8).reshape(-1), 8, 8, 1))
    # flip SOF0 -> SOF2 (progressive): explicit NotImplementedError
    idx = bytes(good).find(b"\xff\xc0")
    good[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(good))


def test_decoder_handles_annex_k_style_tables():
    """The decoder must accept ANY valid DHT, not just our encoder's
    canonical layout: re-encode the DHT segment with the DC table split
    across lengths 2-5 (a different canonical shape for the same 12
    symbols) and check the stream still decodes by rebuilding the
    payload with a matching re-encoded scan."""
    # simplest strong check: decode a stream produced by an encoder
    # variant whose DC codes have mixed lengths.  Emulate by patching the
    # module's table constants locally.
    import baguetter_spark.operators.jpeg as J

    img = _block_constant(16, 16, seed=9)
    old_bits, old_vals = J._ENC_DC_BITS, J._ENC_DC_VALS
    try:
        J._ENC_DC_BITS = [0, 2, 2, 2, 2, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        J._ENC_DC_VALS = bytes(range(12))
        payload = J.encode_jpeg(img.reshape(-1), 16, 16, 1)
    finally:
        J._ENC_DC_BITS, J._ENC_DC_VALS = old_bits, old_vals
    w, h, ch, px = decode_jpeg(payload)
    assert np.array_equal(px, img.reshape(-1))


def test_media_decode_stats_jpeg(spark):
    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_decode_stats,
        media_features,
    )

    img = _block_constant(16, 8, seed=21)
    rows = [("j1", "image", encode_jpeg(img.reshape(-1), 16, 8, 1), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = media_decode_stats(df).collect()[0]
    assert (out["format"], out["width"], out["height"], out["n_channels"]) == (
        "jpeg", 16, 8, 1)
    assert out["n_samples"] == 128 and out["sample_sum"] == int(img.astype(int).sum())
    feat = media_features(df, allow_stub=False).collect()[0]["feature"]
    assert len(feat) == 16

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.

Decode status (round 4): formats that are pure-numpy-decodable from their
PUBLIC specs are decoded FOR REAL — binary PPM/PGM (netpbm P6/P5 headers +
raw raster) and RIFF/WAVE PCM (8/16-bit) — see ``decode_ppm`` /
``decode_wav``; ``media_features(allow_stub=False)`` produces genuine
content features (normalized 16-bin histograms of decoded pixels/samples)
for those formats, and ``media_decode_stats`` emits integer-exact decode
digests (dimensions, sample sums) that the driver-gate DuckDB oracle
cross-checks from closed-form synthesis (gate5 rows ``multimodal_decode_ppm``
/ ``multimodal_decode_wav``).  Compressed codecs (JPEG/PNG/MP3/H.264...)
still need libraries absent from this container, so payloads that are not
netpbm/WAV keep the previous contract: ``allow_stub=True`` runs the
deterministic fake featurizer (SHA-256 -> unit-norm float vector) through
the same Spark plumbing, and ``allow_stub=False`` raises
``NotImplementedError`` naming the missing codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode binary netpbm (P6 color PPM / P5 grayscale PGM, maxval < 256).

    Returns ``(width, height, maxval, samples)`` where ``samples`` is the
    flat uint8 raster (w*h*3 values for P6, w*h for P5, row-major, channels
    interleaved).  Header per the netpbm spec: magic, then whitespace-
    separated width/height/maxval tokens with ``#`` comments allowed, then
    EXACTLY ONE whitespace byte before the raw raster."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        msg = f"not a binary netpbm payload (magic {magic!r})"
        raise ValueError(msg)
    channels = 3 if magic == b"P6" else 1
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        if pos >= len(payload):
            msg = "truncated netpbm header"
            raise ValueError(msg)
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment runs to end of line
            nl = payload.find(b"\n", pos)
            if nl < 0:
                msg = "unterminated netpbm comment"
                raise ValueError(msg)
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(payload) and payload[end : end + 1].isdigit():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        else:
            msg = f"unexpected byte {c!r} in netpbm header"
            raise ValueError(msg)
    width, height, maxval = fields
    if not payload[pos : pos + 1].isspace():
        msg = "netpbm header must end with a single whitespace byte"
        raise ValueError(msg)
    pos += 1
    if maxval <= 0 or maxval > 255:
        msg = f"unsupported netpbm maxval {maxval} (only 1-byte samples)"
        raise ValueError(msg)
    n = width * height * channels
    raster = payload[pos : pos + n]
    if len(raster) != n:
        msg = f"netpbm raster truncated: want {n} bytes, have {len(raster)}"
        raise ValueError(msg)
    return width, height, maxval, np.frombuffer(raster, dtype=np.uint8)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF/WAVE PCM (format tag 1; 8- or 16-bit).

    Returns ``(sample_rate, n_channels, samples)`` — samples as int32
    (uint8 data is centered to [-128, 127] per the WAV convention that
    8-bit PCM is unsigned; 16-bit is signed little-endian), channels
    interleaved in file order.  Chunk walk per the RIFF spec: chunks are
    (id, u32le size, data) with 2-byte alignment padding."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        msg = "not a RIFF/WAVE payload"
        raise ValueError(msg)
    pos = 12
    fmt: tuple[int, int, int, int] | None = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            msg = f"truncated WAV chunk {cid!r}"
            raise ValueError(msg)
        if cid == b"fmt ":
            if size < 16:
                msg = "fmt chunk too short"
                raise ValueError(msg)
            audio_format = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            fmt = (audio_format, n_channels, sample_rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        msg = "WAV missing fmt or data chunk"
        raise ValueError(msg)
    audio_format, n_channels, sample_rate, bits = fmt
    if audio_format != 1:
        msg = f"only PCM WAV supported (format tag {audio_format})"
        raise ValueError(msg)
    if bits == 16:
        samples = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    else:
        msg = f"unsupported PCM bit depth {bits}"
        raise ValueError(msg)
    return sample_rate, n_channels, samples.astype(np.int32)


def _hist_feature(values: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """FEATURE_DIM-bin normalized histogram of decoded content — a real
    (if simple) content feature: identical content -> identical feature,
    and unlike the stub it is a function of the DECODED samples, not the
    container bytes."""
    hist, _ = np.histogram(values, bins=FEATURE_DIM, range=(lo, hi))
    vec = hist.astype(np.float64)
    norm = np.linalg.norm(vec)
    return (vec / norm if norm > 0 else vec).astype(np.float32)


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder: netpbm (P5/P6) and PCM WAV are decoded with the pure
    numpy parsers above; anything else needs codecs absent from this
    container and raises."""
    if payload[:2] in (b"P6", b"P5"):
        _, _, _, px = decode_ppm(payload)
        return _hist_feature(px, 0.0, 256.0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _, _, samples = decode_wav(payload)
        return _hist_feature(samples, -32768.0, 32768.0)
    msg = (
        f"real {kind} decoding for this payload requires codecs not present "
        "in this container (only netpbm P5/P6 and PCM WAV decode natively); "
        "pass allow_stub=True for the deterministic fake"
    )
    raise NotImplementedError(msg)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature: SHA-256(payload || kind) -> FEATURE_DIM
    floats in [-1, 1), unit-normalized.  Stable across runs/machines."""
    digest = hashlib.sha256(payload + kind.encode()).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype="<u4")
    vec = (raw.astype(np.float64) / 2**31) - 1.0
    norm = np.linalg.norm(vec)
    return (vec / norm if norm > 0 else vec).astype(np.float32)


def media_features(media: DataFrame, *, allow_stub: bool = False) -> DataFrame:
    """(media_id, kind, payload, meta) -> (media_id, kind, feature array<float>,
    n_bytes).  Arrow-batched; one Python pass per partition."""
    decode = _decode_stub if allow_stub else _decode_real

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        extract,
        schema="media_id string, kind string, feature array<float>, n_bytes long",
    )


def media_decode_stats(media: DataFrame) -> DataFrame:
    """Integer-exact decode digests for the natively-decodable formats:
    (media_id, format, width, height, n_channels, sample_rate, n_samples,
    sample_sum).  Image rows carry width/height and NULL sample_rate; audio
    rows the reverse.  ``sample_sum`` is the exact int64 sum of decoded
    samples — one mis-parsed header byte shifts every sample and breaks it,
    which is what makes the row a real decode check for the DuckDB oracle
    (the oracle recomputes the sum from the closed-form synthesis of the
    same content).  Arrow-batched mapInPandas, one Python pass, no shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                if payload[:2] in (b"P6", b"P5"):
                    w, h, _, px = decode_ppm(payload)
                    rows.append(
                        (
                            mid,
                            "ppm" if payload[:2] == b"P6" else "pgm",
                            w,
                            h,
                            3 if payload[:2] == b"P6" else 1,
                            None,
                            len(px),
                            int(px.astype(np.int64).sum()),
                        )
                    )
                elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    rate, ch, samples = decode_wav(payload)
                    rows.append(
                        (
                            mid,
                            "wav",
                            None,
                            None,
                            ch,
                            rate,
                            len(samples),
                            int(samples.astype(np.int64).sum()),
                        )
                    )
                else:
                    msg = f"media_decode_stats: undecodable payload for {mid!r}"
                    raise NotImplementedError(msg)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "format",
                    "width",
                    "height",
                    "n_channels",
                    "sample_rate",
                    "n_samples",
                    "sample_sum",
                ],
            )

    return media.mapInPandas(
        stats,
        schema=(
            "media_id string, format string, width int, height int, "
            "n_channels int, sample_rate int, n_samples long, sample_sum long"
        ),
    )


def frame_sample(media: DataFrame, *, every_n_bytes: int = 1024, allow_stub: bool = False) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled 'frame'
    (stub: fixed-stride byte windows; real impl: ffmpeg keyframes).  Shows
    the explode-shaped mapInPandas contract (input row -> many output rows)."""
    if not allow_stub:
        msg = "frame decoding requires ffmpeg; pass allow_stub=True for the stub"
        raise NotImplementedError(msg)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, feats = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(p)
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    window = data[off : off + every_n_bytes]
                    ids.append(mid)
                    fnos.append(i)
                    feats.append(_decode_stub(window, "frame").tolist())
            yield pd.DataFrame({"media_id": ids, "frame_no": fnos, "feature": feats})

    return media.mapInPandas(
        sample, schema="media_id string, frame_no int, feature array<float>"
    )

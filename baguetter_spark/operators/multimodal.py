"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  The actual codecs (PIL/ffmpeg/torchaudio) are NOT
available in this container, so the decode step is STUBBED: with
``allow_stub=True`` a deterministic fake featurizer (SHA-256 -> unit-norm
float vector) exercises the real Spark plumbing — schema, partitioning, UDF
signature, Arrow batch shapes — and raises ``NotImplementedError`` otherwise.
Swapping in a real decoder is a one-function change (``_decode_real``).
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


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder slot (PIL/ffmpeg); unavailable in this sandbox."""
    msg = (
        f"real {kind} decoding requires image/audio codecs not present in "
        "this container; pass allow_stub=True for the deterministic fake"
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

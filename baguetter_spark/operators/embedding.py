"""Text -> embedding plumbing: the Spark counterpart of the reference's
``create_embed_fn`` (``utils/model_helpers.py:11-114``).

Reference semantics: wrap an embedding model into
``encode_fn(texts, is_query, precision)`` that (1) prepends a query/
document prompt, (2) encodes in batches, (3) truncates to
``truncation_dim`` (matryoshka), (4) quantizes to the requested
precision — and feed that into the dense index.  The model itself is a
sentence-transformers checkpoint, which has no runtime in this
container (same documented policy as the multimodal decode and
cross-encoder slots), so the model slot here is a plain
``list[str] -> np.ndarray`` callable, with :func:`hash_embedder` as the
deterministic stand-in that keeps every downstream contract testable:
output schema, prompt application, truncation, Arrow batch shape, and
unit-norm so cosine paths behave.

Spark-first shape: encoding is ONE Arrow-batched ``mapInPandas`` pass
over the corpus (the forward pass would run per Arrow batch on the
executor — exactly where a GPU sits on a real cluster); the output is a
``(.. , <out_col>: array<float>)`` DataFrame that flows directly into
``DenseSparkIndex.build`` / the similarity operators.  Quantized
precisions (i8 / b1, reference ``quantize_embeddings``) are column
compositions over the float output: ``operators/binary_sim.quantize_i8``
and ``binarize`` — both independently gate-verified (knn_i8_cosine,
knn_hamming_b1) — so precision changes never touch the Python kernel.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# The model slot: list of texts -> (n, dim) float array.
EmbedFn = Callable[[list[str]], np.ndarray]


def hash_embedder(dim: int) -> EmbedFn:
    """Deterministic fake embedding model (no runtime in this container).

    Each text's vector is drawn from a PRNG seeded by the SHA-256 of the
    text and L2-normalized — stable across processes, partitions and
    sessions, and distinct texts land on (near-)orthogonal directions,
    so self-similarity == 1.0 > any cross-similarity with overwhelming
    probability: exactly the property integration tests need.
    """
    if dim <= 0:
        msg = f"embedding dim must be positive, got {dim}"
        raise ValueError(msg)

    def embed(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha256((t or "").encode("utf-8")).digest()[:8], "big"
            )
            vec = np.random.default_rng(seed).standard_normal(dim)
            norm = float(np.linalg.norm(vec))
            out[i] = (vec / norm if norm > 0 else vec).astype(np.float32)
        return out

    return embed


def model_embedder(model, *, batch_size: int = 32) -> EmbedFn:
    """Adapt a sentence-transformers-style model (``.encode(list[str])``)
    to the :data:`EmbedFn` slot — the reference's ``embed_fn`` closure
    (``model_helpers.py:38-43``).  Raises without a model, with guidance."""
    if model is None:
        msg = (
            "no embedding-model runtime in this container; pass a model with "
            ".encode(list[str]) -> ndarray or use hash_embedder(dim) for the "
            "deterministic stand-in"
        )
        raise NotImplementedError(msg)

    def embed(texts: list[str]) -> np.ndarray:
        chunks = [
            np.asarray(model.encode(texts[lo : lo + batch_size]))
            for lo in range(0, len(texts), batch_size)
        ]
        return np.concatenate(chunks) if chunks else np.zeros((0, 0), dtype=np.float32)

    return embed


def embed_texts(
    df: DataFrame,
    embed_fn: EmbedFn,
    *,
    dim: int,
    text_col: str = "text",
    out_col: str = "embedding",
    is_query: bool = False,
    query_prompt: str | None = None,
    document_prompt: str | None = None,
    truncation_dim: int | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """Append ``out_col: array<float>`` to ``df`` via one Arrow pass.

    Mirrors the reference ``encode_fn`` contract
    (``model_helpers.py:47-60``): ``is_query`` selects which prompt is
    prepended; ``truncation_dim`` keeps the leading dimensions
    (matryoshka truncation happens BEFORE any quantization, as in the
    reference); ``batch_size`` sub-batches the model call within each
    Arrow batch.  ``dim`` is the model's native output width — declared
    up front because Spark needs the schema before execution, and
    validated against the model's actual output inside the kernel.
    """
    if truncation_dim is not None and not 0 < truncation_dim <= dim:
        msg = f"truncation_dim {truncation_dim} outside (0, {dim}]"
        raise ValueError(msg)
    prompt = query_prompt if is_query else document_prompt
    schema = T.StructType(
        list(df.schema)
        + [T.StructField(out_col, T.ArrayType(T.FloatType(), False), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            texts = ["" if t is None else str(t) for t in pdf[text_col].tolist()]
            if prompt:
                texts = [f"{prompt}{t}" for t in texts]
            vecs: list[np.ndarray] = []
            for lo in range(0, len(texts), batch_size):
                arr = np.asarray(embed_fn(texts[lo : lo + batch_size]))
                if len(texts[lo : lo + batch_size]) and arr.shape[1] != dim:
                    msg = f"embed_fn produced dim {arr.shape[1]}, declared {dim}"
                    raise ValueError(msg)
                vecs.append(arr.astype(np.float32, copy=False))
            mat = (
                np.concatenate(vecs)
                if vecs
                else np.zeros((0, dim), dtype=np.float32)
            )
            if truncation_dim is not None:
                mat = mat[:, :truncation_dim]
            pdf[out_col] = list(mat)
            yield pdf

    return df.mapInPandas(run, schema=schema)

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


def cached_embed_texts(
    df: DataFrame,
    embed_fn: EmbedFn,
    *,
    dim: int,
    cache_path: str,
    text_col: str = "text",
    out_col: str = "embedding",
    is_query: bool = False,
    query_prompt: str | None = None,
    document_prompt: str | None = None,
    truncation_dim: int | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """:func:`embed_texts` behind a persistent embedding cache — the Spark
    counterpart of the reference's ``NumpyCache`` / ``@numpy_cache``
    memoization (``utils/numpy_cache.py:15-122``, SHA-512-keyed disk+memory
    cache wrapped around the embed call in ``model_helpers.py:44-45``).

    The reference memoizes per process on local disk; at 100 TB the cache
    is a shared table and memoization is relational:

    1. key every row by ``sha2(prompted_text, 512)`` (prompt participates
       in the key, as it does in the reference's hashed call args);
    2. LEFT JOIN against the cache table at ``cache_path`` — hits reuse
       the stored vector, the model never sees them;
    3. run the model (one Arrow pass) over the ANTI-JOIN misses only;
    4. APPEND the new ``(cache_key, embedding)`` rows back to the cache
       (key-deduplicated within the batch — append-only parquet, no
       rewrite of existing cache files).

    Like the reference's one-directory-per-model layout
    (``cache_postfix=model name``), one ``cache_path`` belongs to ONE
    (model, dim, truncation) configuration — mixing configurations in a
    cache is the caller's error, as it is in the reference.

    The returned DataFrame joins the input back against the cache table
    AFTER the append (write-then-reread), so the result reads vectors
    from parquet and no executor storage stays pinned across calls; the
    miss set is persisted only for the duration of the append itself.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prompt = (query_prompt if is_query else document_prompt) or ""
    # coalesce: NULL text embeds as "" (embed_texts contract), so it must
    # key as "" too — a NULL key would never join a cache hit and would
    # append a fresh NULL row on every call
    keyed = df.withColumn(
        "__cache_key",
        F.sha2(
            F.concat(F.lit(prompt), F.coalesce(F.col(text_col), F.lit(""))), 512
        ),
    )

    try:
        cache = spark.read.parquet(cache_path).select(
            "cache_key", F.col(out_col).alias("__cached")
        )
    except Exception:  # first call: no cache table yet
        cache = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("cache_key", T.StringType(), False),
                    T.StructField("__cached", T.ArrayType(T.FloatType(), False), True),
                ]
            ),
        )

    joined = keyed.join(
        cache.withColumnRenamed("cache_key", "__cache_key"), "__cache_key", "left"
    )
    misses = joined.where(F.col("__cached").isNull()).drop("__cached")

    embedded = embed_texts(
        misses,
        embed_fn,
        dim=dim,
        text_col=text_col,
        out_col=out_col,
        is_query=is_query,
        query_prompt=query_prompt,
        document_prompt=document_prompt,
        truncation_dim=truncation_dim,
        batch_size=batch_size,
    ).persist()
    try:
        new_rows = embedded.select(
            F.col("__cache_key").alias("cache_key"), F.col(out_col)
        ).dropDuplicates(["cache_key"])
        if not new_rows.isEmpty():
            new_rows.write.mode("append").parquet(cache_path)
    finally:
        # the returned plan reads the just-appended rows back from the cache
        # table, so nothing stays pinned in executor storage after the write
        embedded.unpersist()

    try:
        full_cache = spark.read.parquet(cache_path).select(
            F.col("cache_key").alias("__cache_key"), F.col(out_col)
        )
    except Exception:  # empty input on a nonexistent cache: nothing written
        full_cache = cache.select(
            F.col("cache_key").alias("__cache_key"),
            F.col("__cached").alias(out_col),
        )
    # concurrent writers may race duplicate keys into the append-only
    # table; any one row per key is the same vector for one model config.
    # Prune BEFORE deduplicating: dropDuplicates over the raw table would
    # shuffle the ENTIRE cache (10^10 keys at scale) on every call — the
    # semi-join bounds it to the input's own key set, and parquet gets a
    # pushable join filter instead of a full scan feeding an aggregate.
    full_cache = full_cache.join(
        keyed.select("__cache_key").distinct(), "__cache_key", "left_semi"
    ).dropDuplicates(["__cache_key"])
    return keyed.join(full_cache, "__cache_key").select(*df.columns, out_col)

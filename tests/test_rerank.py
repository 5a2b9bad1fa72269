"""Reranking + embedding model-slot operators.

Covers the reference's post-processing / embed-fn surfaces
(utils/model_helpers.py: create_post_processing_fn 117-176,
create_embed_fn 11-60) as re-expressed in operators/rerank.py and
operators/embedding.py: scorer math, two-phase re-sort tie order,
model-slot refusal without a runtime, prompt/truncation contracts, and
the embed -> dense-index integration loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _candidates(spark):
    docs = [
        (1, "sort merge join"),          # 3/4 for r1
        (2, "fast sort merge join run"),  # 4/4
        (3, "window scan"),               # 0/4
        (4, "fast fast fast"),            # 1/4 (distinct tokens)
        (5, "sort sort merge"),           # 2/4
    ]
    rows = [
        ("r1", "sort merge join fast", d, t) for d, t in docs
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "query_text", "doc_id", "doc_text"])
    )


def test_token_overlap_scorer_math():
    from baguetter_spark.operators.rerank import token_overlap_scorer

    q = pd.Series(["sort merge join fast"] * 4 + [""])
    d = pd.Series(
        [
            "fast sort merge join run",  # 4/4
            "sort sort merge",           # 2/4 — dup doc tokens count once
            "Sort MERGE",                # 2/4 — case-folded
            "zz",                        # 0
            "anything",                  # empty query -> 0
        ]
    )
    out = token_overlap_scorer(q, d)
    assert out.tolist() == [1.0, 0.5, 0.5, 0.0, 0.0]


def test_rerank_topk_order_and_schema(spark):
    from baguetter_spark.operators.rerank import rerank_topk, token_overlap_scorer

    out = rerank_topk(
        _candidates(spark), token_overlap_scorer, top_k=3, id_col="doc_id"
    ).toPandas()
    # text columns dropped before the shuffle by default
    assert set(out.columns) == {"query_id", "doc_id", "rerank_score", "rank"}
    out = out.sort_values("rank")
    got = list(zip(out["doc_id"].tolist(), out["rerank_score"].tolist()))
    assert got == [(2, 1.0), (1, 0.75), (5, 0.5)]


def test_rerank_tie_breaks_by_id(spark):
    from baguetter_spark.operators.rerank import rerank_topk, token_overlap_scorer

    rows = [("q", "alpha", d, "alpha beta") for d in (9, 3, 7, 1)]
    cands = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "query_text", "doc_id", "doc_text"])
    )
    out = rerank_topk(cands, token_overlap_scorer, top_k=3, id_col="doc_id").toPandas()
    assert out["doc_id"].tolist() == [1, 3, 7]  # equal scores -> id asc


def test_keep_doc_text_passthrough(spark):
    from baguetter_spark.operators.rerank import rerank_topk, token_overlap_scorer

    out = rerank_topk(
        _candidates(spark),
        token_overlap_scorer,
        top_k=1,
        id_col="doc_id",
        keep_doc_text=True,
    ).toPandas()
    assert "doc_text" in out.columns and out["doc_text"].iloc[0].startswith("fast ")


def test_cross_encoder_slot_refuses_without_model():
    from baguetter_spark.operators.rerank import cross_encoder_scorer

    with pytest.raises(NotImplementedError, match="cross-encoder"):
        cross_encoder_scorer()


def test_cross_encoder_slot_wraps_predict(spark):
    from baguetter_spark.operators.rerank import cross_encoder_scorer, rerank_topk

    class FakeModel:
        def predict(self, pairs):
            # longer doc wins — distinguishable from token overlap
            return np.array([float(len(d)) for _, d in pairs])

    out = rerank_topk(
        _candidates(spark),
        cross_encoder_scorer(FakeModel(), batch_size=2),
        top_k=2,
        id_col="doc_id",
    ).toPandas()
    assert out["doc_id"].tolist() == [2, 1]  # 23 chars, then 15


def test_search_engine_distributed_reranker(spark):
    """SparkSearchEngine(reranker=...): the retriever becomes candidate
    generation and the hydrated results carry the reranker's scores/ranks
    (distributed counterpart of the reference's post_process_fn,
    search_engine.py:178-180)."""
    from baguetter_spark.engine import BM25SparkIndex
    from baguetter_spark.multi import SparkSearchEngine
    from baguetter_spark.operators.rerank import token_overlap_scorer

    keys = ["a", "b", "c"]
    vals = [
        "sort merge join fast extra words here",  # overlap 4/4
        "sort sort sort sort sort",               # overlap 1/4, high BM25 tf
        "window scan",                            # overlap 0
    ]
    eng = SparkSearchEngine(
        BM25SparkIndex(spark), reranker=token_overlap_scorer
    ).add_many(keys, vals)
    res = eng.search("sort merge join fast", top_k=3)
    assert res["keys"][0] == "a" and res["scores"][0] == 1.0
    assert res["values"][0] == vals[0]  # hydration survives the rerank


# --------------------------------------------------------------- embedding


def test_embed_texts_deterministic_and_unit_norm(spark):
    from baguetter_spark.operators.embedding import embed_texts, hash_embedder

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "aa"]})
    )
    out = embed_texts(df, hash_embedder(16), dim=16).toPandas().set_index("doc_id")
    v1, v2, v3 = (np.array(out.loc[i, "embedding"]) for i in (1, 2, 3))
    assert v1.shape == (16,)
    assert np.allclose(np.linalg.norm(v1), 1.0, atol=1e-5)
    assert np.array_equal(v1, v3)  # same text -> same vector
    assert not np.array_equal(v1, v2)


def test_embed_prompts_and_truncation(spark):
    from baguetter_spark.operators.embedding import embed_texts, hash_embedder

    df = spark.createDataFrame(pd.DataFrame({"text": ["hello"]}))
    fn = hash_embedder(8)
    plain = embed_texts(df, fn, dim=8).toPandas()["embedding"][0]
    doc = embed_texts(df, fn, dim=8, document_prompt="passage: ").toPandas()[
        "embedding"
    ][0]
    q = embed_texts(
        df, fn, dim=8, is_query=True, query_prompt="query: ", document_prompt="p: "
    ).toPandas()["embedding"][0]
    assert not np.array_equal(plain, doc)
    assert not np.array_equal(doc, q)
    trunc = embed_texts(df, fn, dim=8, truncation_dim=3).toPandas()["embedding"][0]
    assert len(trunc) == 3 and np.array_equal(trunc, np.array(plain)[:3])
    with pytest.raises(ValueError, match="truncation_dim"):
        embed_texts(df, fn, dim=8, truncation_dim=9)


def test_embed_dim_mismatch_raises(spark):
    from baguetter_spark.operators.embedding import embed_texts, hash_embedder

    df = spark.createDataFrame(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(Exception, match="declared"):
        embed_texts(df, hash_embedder(4), dim=8).toPandas()


def test_model_embedder_refuses_without_model():
    from baguetter_spark.operators.embedding import model_embedder

    with pytest.raises(NotImplementedError, match="embedding-model"):
        model_embedder(None)


def test_cached_embed_texts_memoizes(spark, tmp_path):
    """Reference NumpyCache semantics (utils/numpy_cache.py): second call
    must NOT re-run the model for cached texts.  Proven by swapping in a
    zeros-embedder on call 2: cached rows keep their call-1 vectors, only
    the genuinely new text gets zeros."""
    from baguetter_spark.operators.embedding import cached_embed_texts, hash_embedder

    cache = str(tmp_path / "embcache")
    df1 = spark.createDataFrame(pd.DataFrame({"text": ["aa", "bb"]}))
    real = hash_embedder(4)
    out1 = (
        cached_embed_texts(df1, real, dim=4, cache_path=cache)
        .toPandas()
        .set_index("text")
    )
    assert len(out1) == 2 and np.linalg.norm(out1.loc["aa", "embedding"]) > 0.9

    def zeros(texts):
        return np.zeros((len(texts), 4), dtype=np.float32)

    df2 = spark.createDataFrame(pd.DataFrame({"text": ["aa", "bb", "cc"]}))
    out2 = (
        cached_embed_texts(df2, zeros, dim=4, cache_path=cache)
        .toPandas()
        .set_index("text")
    )
    assert len(out2) == 3
    assert np.array_equal(out2.loc["aa", "embedding"], out1.loc["aa", "embedding"])
    assert np.array_equal(out2.loc["bb", "embedding"], out1.loc["bb", "embedding"])
    assert np.linalg.norm(out2.loc["cc", "embedding"]) == 0.0  # the one real miss


def test_cached_embed_null_text_memoizes(spark, tmp_path):
    """NULL text embeds as '' (embed_texts contract) and must key as ''
    too — a NULL cache key would miss every call and grow the cache."""
    from baguetter_spark.operators.embedding import cached_embed_texts, hash_embedder

    cache = str(tmp_path / "embcache_null")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, "xx"]})
    )
    out1 = cached_embed_texts(df, hash_embedder(4), dim=4, cache_path=cache)
    assert out1.count() == 2

    def boom(texts):
        raise RuntimeError("model re-invoked for cached rows")

    out2 = cached_embed_texts(df, boom, dim=4, cache_path=cache)
    assert out2.count() == 2
    assert spark.read.parquet(cache).count() == 2  # no duplicate NULL rows


def test_cached_embed_prompt_in_key(spark, tmp_path):
    """Prompted and unprompted encodings of the same text are different
    cache entries (the prompt participates in the reference's hashed args)."""
    from baguetter_spark.operators.embedding import cached_embed_texts, hash_embedder

    cache = str(tmp_path / "embcache2")
    df = spark.createDataFrame(pd.DataFrame({"text": ["same"]}))
    fn = hash_embedder(4)
    plain = cached_embed_texts(df, fn, dim=4, cache_path=cache).toPandas()[
        "embedding"
    ][0]
    prompted = cached_embed_texts(
        df, fn, dim=4, cache_path=cache, document_prompt="passage: "
    ).toPandas()["embedding"][0]
    assert not np.array_equal(plain, prompted)
    # two distinct cache rows
    assert spark.read.parquet(cache).count() == 2


def test_embed_into_dense_index_roundtrip(spark):
    """embed -> DenseSparkIndex: each doc's own text, embedded as a query,
    must return that doc as the top cosine hit (hash embeddings are
    unit-norm and pairwise near-orthogonal)."""
    from baguetter_spark.dense import DenseSparkIndex
    from baguetter_spark.operators.embedding import embed_texts, hash_embedder

    texts = ["alpha beam", "casual gamma", "delta ray", "epsilon field"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(4)], "text": texts})
    )
    fn = hash_embedder(32)
    vectors = embed_texts(df, fn, dim=32).select(
        "doc_id", F.col("embedding").cast("array<double>").alias("vector")
    )
    idx = DenseSparkIndex(spark).build(vectors)
    keys, scores = idx.search(list(fn(["delta ray"])[0].astype(float)), top_k=1)
    assert keys == ["d2"]
    assert scores[0] == pytest.approx(1.0, abs=1e-5)

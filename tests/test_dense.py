"""DenseSparkIndex: brute-force + LSH dense retrieval facade (reference
dense-index API contract, usearch.py:47-417 add/search/remove shape)."""

from __future__ import annotations

import numpy as np
import pytest

from baguetter_spark.dense import DenseSparkIndex


def _vecs(n, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float64)


@pytest.fixture(scope="module")
def dense(spark):
    vecs = _vecs(30)
    keys = [f"d{i:02d}" for i in range(30)]
    return (
        DenseSparkIndex(spark).add_many(keys, [list(v) for v in vecs]),
        keys,
        vecs,
    )


def test_cosine_topk_matches_numpy(dense):
    index, keys, vecs = dense
    q = vecs[3]
    got_keys, got_scores = index.search(list(q), top_k=5)
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = np.lexsort((keys, -sims))[:5]
    assert got_keys == [keys[i] for i in order]
    for s, i in zip(got_scores, order):
        assert s == pytest.approx(sims[i], rel=1e-12)


def test_ip_metric(spark, dense):
    _, keys, vecs = dense
    index = DenseSparkIndex(spark, metric="ip").add_many(
        keys, [list(v) for v in vecs]
    )
    q = vecs[0]
    got_keys, got_scores = index.search(list(q), top_k=3)
    dots = vecs @ q
    order = np.lexsort((keys, -dots))[:3]
    assert got_keys == [keys[i] for i in order]


def test_add_remove_many(spark):
    vecs = _vecs(6)
    keys = [f"k{i}" for i in range(6)]
    index = DenseSparkIndex(spark).add_many(keys, [list(v) for v in vecs])
    index.remove_many(["k2"])
    got_keys, _ = index.search(list(vecs[2]), top_k=6)
    assert "k2" not in got_keys
    with pytest.raises(ValueError):
        index.add_many(["a", "a"], [list(vecs[0]), list(vecs[1])])


def test_dim_mismatch_raises(spark):
    """A wrong-dimension query vector must fail loudly, not return null
    scores (zip_with would silently null-pad)."""
    index = DenseSparkIndex(spark).add_many(
        ["a", "b"], [[1.0, 0.0], [0.0, 1.0]]
    )
    with pytest.raises(Exception, match="dimension|ASSERT"):
        index.search([1.0, 0.0, 5.0], top_k=2)


def test_lsh_candidates_subset(spark, dense):
    """LSH top-k scores must equal exact cosine for every doc it returns
    (same-bucket candidates, exact scoring within)."""
    _, keys, vecs = dense
    exact = DenseSparkIndex(spark).add_many(keys, [list(v) for v in vecs])
    lsh = DenseSparkIndex(spark, use_lsh=True).add_many(keys, [list(v) for v in vecs])
    q = vecs[5]
    ek, es = exact.search(list(q), top_k=30)
    lk, ls = lsh.search(list(q), top_k=30)
    exact_by_key = dict(zip(ek, es))
    assert set(lk) <= set(ek)
    for k, s in zip(lk, ls):
        assert s == pytest.approx(exact_by_key[k], rel=1e-12)


def test_hybrid_with_multi_index(spark):
    """Dense engine composes with MultiSparkIndex when queries carry both
    text and vector columns (reference MultiIndex hybrid contract)."""
    import pandas as pd

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.engine import BM25SparkIndex
    from baguetter_spark.multi import MultiSparkIndex

    texts = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"]
    keys = ["d0", "d1", "d2"]
    # d1 wins both modalities outright: query text hits both its rare terms,
    # query vector is exactly its vector (others orthogonal)
    vecs = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    bm25 = BM25SparkIndex(spark, cfg).add_many(keys, texts)
    dense = DenseSparkIndex(spark).add_many(keys, vecs)

    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["q0"], "text": ["beta delta"], "vector": [vecs[1]]}
        )
    )
    # comb_sum: d1 has max normalized score in BOTH runs -> unambiguous
    # winner (the reference's RRF 1/(rank+score) form ties rank0=1/nscore=0
    # with rank0=0/nscore=1 by construction — a faithful quirk, fuser.py:31)
    multi = MultiSparkIndex({"bm25": bm25, "dense": dense}, algorithm="comb_sum")
    res = multi.score_queries(qdf, top_k=3).collect()
    assert res, "hybrid fusion returned rows"
    best = min(res, key=lambda r: r["rank"])
    assert best["doc_id"] == "d1"


def test_empty_index_raises(spark):
    index = DenseSparkIndex(spark)
    with pytest.raises(RuntimeError, match="empty"):
        index.search([1.0, 0.0], top_k=2)


def test_zero_norm_vector_excluded(spark):
    """A zero-norm doc vector makes cosine NaN; Spark ranks NaN above every
    real score — it must be dropped, not returned at rank 1."""
    index = DenseSparkIndex(spark).add_many(
        ["z", "a", "b"], [[0.0, 0.0], [1.0, 0.0], [0.7, 0.7]]
    )
    keys, scores = index.search([1.0, 0.0], top_k=3)
    assert "z" not in keys
    assert keys[0] == "a"
    assert all(s == s for s in scores)  # no NaN survives


def test_embedding_near_dup_exhaustive_matches_numpy(spark):
    """Exhaustive mode is the exact recall baseline: pair set == numpy."""
    from baguetter_spark.operators.similarity import embedding_near_dup_pairs

    vecs = _vecs(40, dim=8, seed=3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    thr = 0.5
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=thr, exhaustive=True
        ).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    true = {
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if round(sims[a, b], 6) >= thr
    }
    assert true, "fixture must produce at least one true pair"
    assert got == true


def test_embedding_near_dup_lsh_subset_and_recall(spark):
    """LSH mode: every reported pair is a verified true pair (exactness of
    the verification stage), and on this fixed fixture the deterministic
    integer-plane banding recalls at least half the true pairs (the
    banding s-curve at cos ~0.5; real near-dup thresholds 0.9+ sit far
    higher on the curve)."""
    from baguetter_spark.operators.similarity import embedding_near_dup_pairs

    vecs = _vecs(60, dim=8, seed=11)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    thr = 0.5
    true = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=thr, exhaustive=True
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(df, threshold=thr, dim=8).collect()
    }
    assert got <= true  # verification stage never passes a false pair
    assert true, "fixture must produce at least one true pair"
    assert len(got) / len(true) >= 0.5

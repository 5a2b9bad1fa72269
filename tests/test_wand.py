"""Rank-safety of the block-max MaxScore pruned path: identical top-k doc
sets + scores vs exhaustive scoring, on randomized posting sets and through
the full Spark query path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.fixtures import gen_queries, gen_transcripts
from baguetter_spark.operators.indexer import build_index
from baguetter_spark.operators.search import score_queries
from baguetter_spark.operators.wand import maxscore_topk


def exhaustive(weights, doc_arrays, impact_arrays):
    acc: dict[int, float] = {}
    for w, ids, imp in zip(weights, doc_arrays, impact_arrays):
        for d, x in zip(ids, imp):
            acc[int(d)] = acc.get(int(d), 0.0) + float(w) * float(x)
    return acc


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 3, 10, 100])
def test_kernel_rank_safe(seed, k):
    rng = np.random.default_rng(seed)
    n_docs = 500
    n_terms = rng.integers(1, 8)
    doc_arrays, impact_arrays = [], []
    for _ in range(n_terms):
        df = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        imp = rng.random(df).astype(np.float32) * rng.choice([0.5, 2.0, 8.0])
        doc_arrays.append(ids)
        impact_arrays.append(imp)
    weights = rng.choice([1.0, 1.0, 2.0, 0.5], size=n_terms)

    ids, scores = maxscore_topk(weights, doc_arrays, impact_arrays, k)
    truth = exhaustive(weights, doc_arrays, impact_arrays)
    # canonical top-k of the truth
    ordered = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:k]
    got = sorted(zip(ids.tolist(), scores.tolist()), key=lambda t: (-t[1], t[0]))
    assert len(got) == len(ordered)
    for (gd, gs), (ed, es) in zip(got, ordered):
        assert abs(gs - es) < 1e-9, (gd, gs, ed, es)
    # doc sets must agree except equal-score boundary swaps
    gset, eset = {d for d, _ in got}, {d for d, _ in ordered}
    if gset != eset:
        boundary = min(s for _, s in ordered)
        for d in gset ^ eset:
            assert abs(truth[d] - boundary) < 1e-9


def test_empty_terms():
    ids, scores = maxscore_topk(
        np.array([1.0]), [np.empty(0, dtype=np.int64)], [np.empty(0, dtype=np.float32)], 5
    )
    assert len(ids) == 0


def test_spark_pruned_equals_exhaustive(spark):
    corpus = gen_transcripts(120, 15, seed=17, vocab_size=200)
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(),
        block_doc_range=32,  # force multiple doc-range groups
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    queries = gen_queries(10, seed=9, vocab_size=200)
    qdf = spark.createDataFrame(queries)

    fast = score_queries(index, qdf, top_k=10, parity=False).collect()
    pruned = score_queries(index, qdf, top_k=10, pruned=True).collect()

    def keyed(rows):
        return {
            (r["query_id"], r["doc_id"]): (r["rank"], round(float(r["score"]), 6))
            for r in rows
        }

    f, p = keyed(fast), keyed(pruned)
    assert set(f) == set(p)
    for k_ in f:
        assert f[k_][0] == p[k_][0], (k_, f[k_], p[k_])
        assert abs(f[k_][1] - p[k_][1]) < 1e-6


def test_negative_weight_pruned_falls_back(spark):
    """MaxScore's suffix bound is invalid under negative weights (a partial
    score can DECREASE later).  pruned=True must detect the negative weight
    and fall back to exhaustive scoring — results identical to parity=False."""
    import pandas as pd

    corpus = gen_transcripts(100, 12, seed=5, vocab_size=150)
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(), block_doc_range=32
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q0", "q0"],
                "part": [0, 1],
                "text": ["term00001 term00002 spark", "term00003 the hot01"],
                "weight": [1.0, -2.0],
            }
        )
    )
    fast = score_queries(index, qdf, top_k=10, parity=False).collect()
    pruned = score_queries(index, qdf, top_k=10, pruned=True).collect()
    f = {(r["query_id"], r["doc_id"]): (r["rank"], round(float(r["score"]), 9)) for r in fast}
    p = {(r["query_id"], r["doc_id"]): (r["rank"], round(float(r["score"]), 9)) for r in pruned}
    assert f == p

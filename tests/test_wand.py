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


@pytest.mark.parametrize("mode", [True, "blockmax"])
def test_spark_pruned_equals_exhaustive(spark, mode):
    corpus = gen_transcripts(120, 15, seed=17, vocab_size=200)
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(),
        block_doc_range=32,  # force multiple doc-range groups (4 blocks)
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    queries = gen_queries(10, seed=9, vocab_size=200)
    qdf = spark.createDataFrame(queries)

    fast = score_queries(index, qdf, top_k=10, parity=False).collect()
    pruned = score_queries(index, qdf, top_k=10, pruned=mode).collect()

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


def test_blockmax_tie_boundary(spark):
    """All-equal scores put every doc exactly AT θ: the epsilon keep-margin
    must retain every block so canonical (score desc, doc_idx asc) tie order
    matches exhaustive scoring identically."""
    corpus = gen_transcripts(8, 12, seed=3, vocab_size=50)
    # identical text everywhere → every doc scores identically for any query
    corpus["text"] = "alpha beta gamma"
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(), block_doc_range=16
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["alpha gamma"]})
    )
    fast = score_queries(index, qdf, top_k=7, parity=False).collect()
    bm = score_queries(
        index, qdf, top_k=7, pruned="blockmax", probe_blocks=1
    ).collect()
    f = {(r["query_id"], r["doc_id"]): r["rank"] for r in fast}
    b = {(r["query_id"], r["doc_id"]): r["rank"] for r in bm}
    assert f == b and len(f) == 7


def test_blockmax_single_probe_block(spark):
    """probe_blocks=1 with k larger than any single block's candidate count:
    θ never forms (phase A yields < k rows), every block must be kept."""
    corpus = gen_transcripts(90, 15, seed=23, vocab_size=120)
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(), block_doc_range=16
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    qdf = spark.createDataFrame(gen_queries(6, seed=4, vocab_size=120))
    fast = score_queries(index, qdf, top_k=50, parity=False).collect()
    bm = score_queries(
        index, qdf, top_k=50, pruned="blockmax", probe_blocks=1
    ).collect()
    f = {(r["query_id"], r["doc_id"]): (r["rank"], float(r["score"])) for r in fast}
    b = {(r["query_id"], r["doc_id"]): (r["rank"], float(r["score"])) for r in bm}
    assert set(f) == set(b)
    for key in f:
        assert f[key][0] == b[key][0], (key, f[key], b[key])
        # f64 summation order differs between the two paths — tolerance, not
        # equality (the parity-mode f32 ordered fold is the bit-exact path)
        assert abs(f[key][1] - b[key][1]) < 1e-5


def test_invalid_pruned_value(spark):
    corpus = gen_transcripts(10, 5, seed=1, vocab_size=30)
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    qdf = spark.createDataFrame(pd.DataFrame({"query_id": ["q0"], "text": ["x"]}))
    with pytest.raises(ValueError, match="pruned"):
        score_queries(index, qdf, pruned="wand-ish")
    with pytest.raises(ValueError, match="probe_blocks"):
        score_queries(index, qdf, pruned="blockmax", probe_blocks=0)


@pytest.mark.parametrize("mode", [True, "blockmax"])
def test_negative_weight_pruned_falls_back(spark, mode):
    """MaxScore's suffix bound is invalid under negative weights (a partial
    score can DECREASE later) — and so is the blockmax block bound.  Both
    pruned modes must detect the negative weight and fall back to exhaustive
    scoring — results identical to parity=False."""

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
    pruned = score_queries(index, qdf, top_k=10, pruned=mode).collect()
    f = {(r["query_id"], r["doc_id"]): (r["rank"], round(float(r["score"]), 9)) for r in fast}
    p = {(r["query_id"], r["doc_id"]): (r["rank"], round(float(r["score"]), 9)) for r in pruned}
    assert f == p


def test_blockmax_skip_stats_accounting_and_skips(spark):
    """blockmax_skip_stats (round-5 evidence companion): block accounting
    is consistent (total == probed + kept + skipped) and, on a corpus
    where one block concentrates the high-impact postings, θ-gating
    SKIPS the low-bound blocks — while the pruned search itself stays
    rank-identical to exhaustive (skipping never costs a result)."""
    from baguetter_spark.operators.search import blockmax_skip_stats

    corpus = gen_transcripts(64, 4, seed=5, vocab_size=60)
    # rows are (conv, turn)-ordered = doc_idx order: docs 0-15 carry 'hot'
    # at tf=4 in 4-token docs (huge impact); the rest mention it once in a
    # 21-token doc (tiny impact) -> block 0 dominates every upper bound
    texts = []
    for i in range(len(corpus)):
        if i < 16:
            texts.append("hot hot hot hot")
        else:
            texts.append("hot " + " ".join(f"filler{(i + j) % 30}" for j in range(20)))
    corpus["text"] = texts
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig.parity(), block_doc_range=16
    )
    index = build_index(spark, spark.createDataFrame(corpus), cfg)
    qdf = spark.createDataFrame(pd.DataFrame({"query_id": ["q0"], "text": ["hot"]}))

    stats = blockmax_skip_stats(index, qdf, top_k=3, probe_blocks=1).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s["blocks_total"] == 4  # 64 docs / 16-doc ranges, 'hot' in all
    assert s["blocks_probed"] == 1
    assert (
        s["blocks_total"]
        == s["blocks_probed"] + s["blocks_kept"] + s["blocks_skipped"]
    )
    assert s["blocks_skipped"] >= 1, dict(s.asDict())
    assert s["theta"] is not None and s["theta"] > 0

    # skipping is rank-safe: blockmax == exhaustive on the same query
    fast = score_queries(index, qdf, top_k=3, parity=False).collect()
    bm = score_queries(
        index, qdf, top_k=3, pruned="blockmax", probe_blocks=1
    ).collect()
    f = {(r["query_id"], r["doc_id"]): r["rank"] for r in fast}
    b = {(r["query_id"], r["doc_id"]): r["rank"] for r in bm}
    assert f == b

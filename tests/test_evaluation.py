"""Evaluation harness tests: vendored Spark-native metrics vs a hand-rolled
NumPy computation, plus the evaluate_retrievers end-to-end flow (reference
`evaluation/eval.py` contract, `tests/evaluation/eval_test.py` shape)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.engine import BM25SparkIndex, BMXSparkIndex
from baguetter_spark.evaluation import (
    SparkDataset,
    create_metrics,
    evaluate_retrievers,
    per_query_metrics,
    score_run,
)


def np_ndcg(run_docs, rels: dict, k: int) -> float:
    gains = [rels.get(d, 0) for d in run_docs[:k]]
    dcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains))
    ideal = sorted(rels.values(), reverse=True)[:k]
    idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
    return dcg / idcg if idcg else 0.0


@pytest.fixture(scope="module")
def tiny_run_qrels(spark):
    # q1: docs ranked d1..d5 with descending scores; rels: d2=2, d4=1, d9=3 (missed)
    run = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q1"] * 5 + ["q2"] * 3,
                "doc_id": ["d1", "d2", "d3", "d4", "d5", "d7", "d8", "d2"],
                "score": [5.0, 4.0, 3.0, 2.0, 1.0, 9.0, 8.0, 7.0],
            }
        )
    )
    qrels = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q1", "q1", "q1", "q2", "q3"],
                "doc_id": ["d2", "d4", "d9", "d8", "d1"],
                "relevance": [2, 1, 3, 1, 1],
            }
        )
    )
    return run, qrels


def test_metrics_vs_numpy(spark, tiny_run_qrels):
    run, qrels = tiny_run_qrels
    metrics = ["ndcg@5", "precision@5", "recall@5", "mrr@5", "map@5"]
    pq = {r["query_id"]: r for r in per_query_metrics(run, qrels, metrics).collect()}

    # qrels query set is the frame: q3 present (all zeros), q1, q2 scored
    assert set(pq) == {"q1", "q2", "q3"}

    q1_rels = {"d2": 2, "d4": 1, "d9": 3}
    assert pq["q1"]["ndcg@5"] == pytest.approx(
        np_ndcg(["d1", "d2", "d3", "d4", "d5"], q1_rels, 5)
    )
    assert pq["q1"]["precision@5"] == pytest.approx(2 / 5)
    assert pq["q1"]["recall@5"] == pytest.approx(2 / 3)
    assert pq["q1"]["mrr@5"] == pytest.approx(1 / 2)
    # AP@5 = (P@2 + P@4)/|rel| = (1/2 + 2/4)/3
    assert pq["q1"]["map@5"] == pytest.approx((0.5 + 0.5) / 3)

    # q2: relevant d8 at rank 2
    assert pq["q2"]["ndcg@5"] == pytest.approx(np_ndcg(["d7", "d8", "d2"], {"d8": 1}, 5))
    assert pq["q2"]["mrr@5"] == pytest.approx(1 / 2)

    # q3: no run rows -> all zeros
    assert pq["q3"]["ndcg@5"] == 0.0
    assert pq["q3"]["precision@5"] == 0.0


def test_score_run_means(spark, tiny_run_qrels):
    run, qrels = tiny_run_qrels
    out = score_run(run, qrels, ["precision@5"])
    assert out["precision@5"] == pytest.approx((2 / 5 + 1 / 5 + 0.0) / 3)


def test_create_metrics():
    assert create_metrics(["ndcg", "mrr"], [1, 10]) == [
        "ndcg@1", "ndcg@10", "mrr@1", "mrr@10",
    ]


def test_rank_ties_canonical(spark):
    """Equal scores rank by doc_id asc — deterministic across partitions."""
    run = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["q"] * 3, "doc_id": ["c", "a", "b"], "score": [1.0, 1.0, 1.0]}
        )
    )
    qrels = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q"], "doc_id": ["a"], "relevance": [1]})
    )
    pq = per_query_metrics(run, qrels, ["mrr@3"]).collect()[0]
    assert pq["mrr@3"] == pytest.approx(1.0)  # 'a' sorts first among ties


def test_evaluate_retrievers_end_to_end(spark):
    """Mock-dataset flow mirroring the reference eval_test.py: both engines,
    report + timings populated, self-hit filtering, perfect-retriever ndcg."""
    corpus = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "text": [
                "spark shuffle partition skew",
                "inverted index posting list",
                "bm25 scoring lucene atire",
                "watermark streaming state store",
                "broadcast join hash build",
                "partition pruning scan filter",
                "posting compression varint delta",
                "query top-k heap scatter",
            ],
        }
    )
    queries = pd.DataFrame(
        {
            "query_id": ["q0", "q1"],
            "text": ["posting compression delta", "partition skew shuffle"],
        }
    )
    qrels = pd.DataFrame(
        {
            "query_id": ["q0", "q0", "q1"],
            "doc_id": ["d6", "d1", "d0"],
            "relevance": [2, 1, 1],
        }
    )
    ds = SparkDataset(
        name="mock",
        corpus=spark.createDataFrame(corpus),
        queries=spark.createDataFrame(queries),
        qrels=spark.createDataFrame(qrels),
    )
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    results = evaluate_retrievers(
        [ds],
        {
            "bm25": lambda: BM25SparkIndex(spark, cfg),
            "bmx": lambda: BMXSparkIndex(spark, cfg),
        },
        metrics=["ndcg@10", "precision@1", "mrr@10"],
        top_k=10,
    )
    res = results.results["mock"]
    assert set(res.report) == {"bm25", "bmx"}
    for name in ("bm25", "bmx"):
        r = res.report[name]
        assert set(r) == {"ndcg@10", "precision@1", "mrr@10"}
        # d6 is the only doc with all of q0's tokens; d0 matches q1 best
        assert r["precision@1"] == pytest.approx(1.0)
        assert r["mrr@10"] == pytest.approx(1.0)
        assert 0.8 < r["ndcg@10"] <= 1.0
        assert res.timings[name]["index_time"] > 0
        assert res.timings[name]["search_time"] > 0

    # persistence mirror (reference eval.py:69-140)
    import json
    import tempfile

    out_dir = tempfile.mkdtemp()
    results.save(out_dir)
    with open(f"{out_dir}/mock/report.json") as f:
        saved = json.load(f)
    assert saved["bm25"]["mrr@10"] == pytest.approx(1.0)

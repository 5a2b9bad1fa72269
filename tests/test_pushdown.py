"""Scan-pushdown behavior of the search scatter:

- saved (parquet-backed) index: the queried term-id set must reach the
  posting scan as a pushed filter (row-group pruning at scale);
- in-memory (persisted) index: no pushdown job — the filter saves nothing
  when the postings are already cached, and collecting the id set costs a
  full extra Spark job per query batch.
"""

from __future__ import annotations

import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.io import load_index, save_index
from baguetter_spark.operators.indexer import build_index
from baguetter_spark.operators.search import score_queries


@pytest.fixture(scope="module")
def saved_index(spark, tmp_path_factory):
    from baguetter_spark.fixtures import gen_transcripts

    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    idx = build_index(
        spark, spark.createDataFrame(gen_transcripts(40, 4, seed=3, vocab_size=80)), cfg
    )
    base = str(tmp_path_factory.mktemp("idx"))
    save_index(idx, base)
    return idx, load_index(spark, base)


def _qdf(spark):
    return spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["term00001 term00002 term00003"]})
    )


def test_saved_index_pushes_term_filter(spark, saved_index):
    _, loaded = saved_index
    assert not loaded.postings.storageLevel.useMemory
    res = score_queries(loaded, _qdf(spark), top_k=5, parity=False)
    plan = res._jdf.queryExecution().toString()
    assert "term_id" in plan
    # the isin literal filter must appear over the parquet scan
    assert "In(term_id" in plan or "term_id IN" in plan or "isin" in plan, plan[:2000]


def test_cached_index_skips_pushdown_job(spark, saved_index):
    built, _ = saved_index
    assert built.postings.storageLevel.useMemory
    res = score_queries(built, _qdf(spark), top_k=5, parity=False)
    plan = res._jdf.queryExecution().toString()
    assert "In(term_id" not in plan and "term_id IN " not in plan

    # and results agree between the two paths
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in res.collect()
    )
    _, loaded = saved_index
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in score_queries(loaded, _qdf(spark), top_k=5, parity=False).collect()
    )
    assert a == b

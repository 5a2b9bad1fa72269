"""Plan-shape regression tests for the three scale-critical physical plans
(round-3 VERDICT item 9).  These assert on ``explain()`` output so a future
refactor cannot silently reintroduce a shuffle or lose a pushed filter —
each guarded property is worth orders of magnitude at the 100 TB target:

1. presorted build — the fused tokenize+assign+TF Arrow pass produces the
   per-(doc, term) table (the heaviest text-derived intermediate) with ZERO
   Exchange nodes: corpus text never crosses a shuffle boundary;
2. saved-index search — the query's term-id set reaches the parquet scan
   as ``PushedFilters`` (row-group pruning on the postings table, not a
   post-scan filter over the full index);
3. IVF pretrained assignment — cell assignment is a map-side broadcast
   argmax: no Exchange hash-partitioned by ``vec_id`` anywhere in the plan
   (the shape the old crossJoin+row_number window plan required).
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.fixtures import gen_transcripts


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_presorted_tf_plan_has_no_shuffle(spark):
    from baguetter_spark.operators.presorted import (
        partition_layout,
        presorted_local_tf,
    )

    corpus = (
        spark.createDataFrame(gen_transcripts(120, 10, seed=7, vocab_size=120))
        .repartitionByRange(4, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .persist()
    )
    try:
        layout = partition_layout(corpus)
        assert layout is not None, "fixture corpus must verify as presorted"
        cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
        tf = presorted_local_tf(corpus, layout, cfg)
        plan = _executed(tf)
        # the InMemoryRelation section replays the FIXTURE's own
        # repartitionByRange lineage (display only — the cache is already
        # materialized); the TF pass is everything above the cache scan
        tf_section = plan.split("InMemoryRelation")[0]
        assert "Exchange" not in tf_section, plan
        # and the Arrow kernel is really in the plan (not optimized away)
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan
        # sanity: the pass actually produces the TF contract
        row = tf.limit(1).collect()
        assert row and row[0]["tf"] >= 1
    finally:
        corpus.unpersist()


@pytest.fixture(scope="module")
def loaded_index(spark, tmp_path_factory):
    from baguetter_spark.io import load_index, save_index
    from baguetter_spark.operators.indexer import build_index

    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    idx = build_index(
        spark,
        spark.createDataFrame(gen_transcripts(40, 4, seed=3, vocab_size=80)),
        cfg,
    )
    base = str(tmp_path_factory.mktemp("planidx"))
    save_index(idx, base)
    return load_index(spark, base)


def test_search_term_filter_reaches_parquet_scan(spark, loaded_index):
    from baguetter_spark.operators.search import score_queries

    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["term00001 term00002"]})
    )
    res = score_queries(loaded_index, queries, top_k=5, parity=False)
    plan = _executed(res)
    # the pushed-filter annotation must sit on the file scan itself:
    # "PushedFilters: [In(term_id, ..." — a Filter node above the scan
    # reads the whole postings table at scale and does NOT count
    m = re.search(r"PushedFilters:\s*\[([^\]]*)\]", plan)
    assert m is not None, plan[:3000]
    assert "term_id" in m.group(1), m.group(0)


def test_ivf_pretrained_assignment_is_map_side(spark):
    from baguetter_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F_col_double("embedding")
    )
    res = ivf_cosine_topk(
        emb,
        [0, 1, 2],
        k=3,
        n_probe=2,
        centroid_ids=[5, 6, 7, 8],
    )
    plan = _executed(res)
    # broadcast-argmax assignment: the only hash partitionings allowed are
    # the per-query gather/top-k (query_id); a vec_id-partitioned Exchange
    # is the signature of the old crossJoin + row_number-window assignment
    assert not re.search(r"hashpartitioning\(vec_id", plan), plan
    # the Arrow argmax kernel must be present
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan


def F_col_double(name: str):
    from pyspark.sql import functions as F

    return F.col(name).cast("array<double>").alias(name)


def test_bmx_fast_path_scalars_stay_jvm_side(spark):
    """Round-4 guard: the fast-path per-query scalars (ent_max,
    avg_entropy) are ONE JVM hash aggregate; reintroducing the
    collect_list + pandas-UDF plan would add a whole Python stage per
    search (the bmx_search_20q root cause — BENCH/BASELINE.md round 4)."""
    import pandas as pd

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators.bmx import bmx_score_queries, build_bmx_index

    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    idx = build_bmx_index(
        spark,
        spark.createDataFrame(gen_transcripts(30, 4, seed=11, vocab_size=60)),
        cfg,
    )
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["term00001 term00002"]})
    )
    fast = bmx_score_queries(idx, qdf, top_k=5, parity=False)
    plan = _executed(fast)
    assert "collect_list" not in plan, plan
    # the decode kernel is still the (single) Python pass
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan

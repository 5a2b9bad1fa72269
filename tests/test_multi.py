"""MultiIndex fan-out + SearchEngine doc-store join (reference mutli.py /
search_engine.py contracts)."""

from __future__ import annotations

import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.engine import BM25SparkIndex, BMXSparkIndex
from baguetter_spark.multi import MultiSparkIndex, SparkSearchEngine
from baguetter_spark.operators.fuser import fuse

CORPUS_KEYS = [f"d{i}" for i in range(6)]
CORPUS_TEXTS = [
    "spark shuffle partition skew salt",
    "inverted index posting list varint",
    "partition pruning scan filter spark",
    "posting compression delta block",
    "skew join broadcast hash build",
    "top-k heap scatter gather query",
]


@pytest.fixture(scope="module")
def engines(spark):
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    bm25 = BM25SparkIndex(spark, cfg).add_many(CORPUS_KEYS, CORPUS_TEXTS)
    bmx = BMXSparkIndex(spark, cfg).add_many(CORPUS_KEYS, CORPUS_TEXTS)
    return bm25, bmx


def test_multi_index_fuses_runs(spark, engines):
    bm25, bmx = engines
    multi = MultiSparkIndex({"bm25": bm25, "bmx": bmx})
    keys, scores = multi.search("posting compression spark", top_k=5)
    assert keys, "fused result must be non-empty"
    # fused scores descending, in (0, 1] after the /n_runs renormalization
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(0 < s for s in scores)

    # differential: fusing the two runs manually must give the same result
    import pandas as pd
    from pyspark.sql import functions as F

    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["posting compression spark"]})
    )
    runs = (
        bm25.score_queries(qdf, top_k=5).withColumn("run", F.lit("bm25"))
        .unionByName(bmx.score_queries(qdf, top_k=5).withColumn("run", F.lit("bmx")))
        .select("query_id", "run", "doc_id", "score")
    )
    expected = {
        r["doc_id"]: r["score"]
        for r in fuse(runs, "reciprocal_rank", top_k=5).collect()
    }
    got = {f"{k}:0": s for k, s in zip(keys, scores)}
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], rel=1e-12)


def test_multi_index_weighted_algorithm(spark, engines):
    bm25, bmx = engines
    multi = MultiSparkIndex(
        {"bm25": bm25, "bmx": bmx},
        algorithm="weighted",
        weights={"bm25": 2.0, "bmx": 0.5},
    )
    keys, scores = multi.search("partition skew", top_k=4)
    assert keys
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_multi_index_add_remove_index(spark, engines):
    bm25, bmx = engines
    multi = MultiSparkIndex().add_index("bm25", bm25)
    assert multi.name == "['bm25']"
    multi.add_index("bmx", bmx).remove_index("bmx")
    assert list(multi.indices) == ["bm25"]
    with pytest.raises(ValueError):
        MultiSparkIndex().search("x")


def test_search_engine_hydrates_values(spark):
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    engine = SparkSearchEngine(BM25SparkIndex(spark, cfg))
    engine.add_many(CORPUS_KEYS, CORPUS_TEXTS)
    res = engine.search("posting compression", top_k=3)
    assert res["query"] == "posting compression"
    assert res["keys"]
    text_by_key = dict(zip(CORPUS_KEYS, CORPUS_TEXTS))
    for k, v in zip(res["keys"], res["values"]):
        assert v == text_by_key[k], "stored value must match the source doc"


def test_search_engine_remove_many(spark):
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    engine = SparkSearchEngine(BM25SparkIndex(spark, cfg))
    engine.add_many(CORPUS_KEYS, CORPUS_TEXTS)
    engine.remove_many(["d3"])
    res = engine.search("posting compression delta block", top_k=6)
    assert "d3" not in res["keys"]


def test_search_engine_post_process_hook(spark):
    """post_process_fn mirror (search_engine.py:54,178-180): reverse ranker."""
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())

    def reverse_all(results):
        for r in results:
            r["keys"] = list(reversed(r["keys"]))
            r["scores"] = list(reversed(r["scores"]))
            r["values"] = list(reversed(r["values"]))
        return results

    engine = SparkSearchEngine(
        BM25SparkIndex(spark, cfg), post_process_fn=reverse_all
    )
    engine.add_many(CORPUS_KEYS, CORPUS_TEXTS)
    res = engine.search("posting compression", top_k=3)
    assert res["scores"] == sorted(res["scores"])  # ascending after reversal


def test_search_engine_over_multi_index(spark, engines):
    """SparkSearchEngine composed over MultiSparkIndex (ADVICE multi.py:93):
    the fused run emits raw user keys (synthetic :0 stripped per sub-index),
    so the store must hydrate every one of them."""
    bm25, bmx = engines
    multi = MultiSparkIndex({"bm25": bm25, "bmx": bmx}, algorithm="comb_sum")
    engine = SparkSearchEngine(multi)
    engine.add_many(CORPUS_KEYS, CORPUS_TEXTS)
    res = engine.search("posting compression spark", top_k=4)
    assert res["keys"], "fused search must return rows"
    text_by_key = dict(zip(CORPUS_KEYS, CORPUS_TEXTS))
    for k, v in zip(res["keys"], res["values"]):
        assert v == text_by_key[k], f"hydration missed key {k!r}"


def test_dataframe_built_multi_keeps_turn_ids(spark):
    """DataFrame-built sub-indices emit REAL conv:turn ids — a blanket :0
    strip would mangle turn-0 ids (c:0 -> c) while c:1 keeps its suffix.
    With per-sub-index key-style tracking, both turns survive intact."""
    import pandas as pd

    from baguetter_spark.fixtures import gen_transcripts

    corpus = gen_transcripts(40, 8, seed=23, vocab_size=60)
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    bm25 = BM25SparkIndex(spark, cfg).build(spark.createDataFrame(corpus))
    assert not bm25.synthetic_turn_suffix
    multi = MultiSparkIndex({"bm25": bm25}, algorithm="comb_sum")
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["term00001 term00002 the spark"]})
    )
    res = multi.score_queries(qdf, top_k=20).collect()
    assert res
    doc_ids = {r["doc_id"] for r in res}
    # every fused id must be a real (conv_id, turn_idx) composite
    assert all(":" in d for d in doc_ids), doc_ids
    direct = {
        r["doc_id"]
        for r in bm25.score_queries(qdf, top_k=20, parity=False).collect()
    }
    assert doc_ids == direct

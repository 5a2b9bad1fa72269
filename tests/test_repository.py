"""IndexRepository: named-index catalog over Hadoop FS URIs (the offline
counterpart of the reference's HF Hub repository — utils/file_repository.py
+ utils/persistable.py push_to_hub/load_from_hub)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.engine import BM25SparkIndex, BMXSparkIndex
from baguetter_spark.fixtures import gen_transcripts
from baguetter_spark.operators.bmx import BMXIndex, bmx_score_queries, build_bmx_index
from baguetter_spark.operators.indexer import build_index
from baguetter_spark.operators.search import score_queries
from baguetter_spark.repository import IndexRepository, hadoop_read_text, hadoop_write_text


@pytest.fixture(scope="module")
def corpus():
    return gen_transcripts(40, 6, seed=33, vocab_size=80)


def _cfg():
    return SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())


def _queries(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["q0", "q1"], "text": ["term00001 term00004", "hot00 term00002"]}
        )
    )


def _results_map(df):
    return {
        (r["query_id"], r["doc_id"]): (r["rank"], np.float32(r["score"]))
        for r in df.collect()
    }


def test_hadoop_text_roundtrip(spark, tmp_path):
    uri = "file:" + str(tmp_path / "note.txt")
    hadoop_write_text(spark, uri, '{"a": 1}')
    assert hadoop_read_text(spark, uri) == '{"a": 1}'
    # overwrite goes through the same tmp+rename path
    hadoop_write_text(spark, uri, "v2")
    assert hadoop_read_text(spark, uri) == "v2"
    assert hadoop_read_text(spark, "file:" + str(tmp_path / "absent")) is None


def test_push_pull_roundtrip_schemeless_base(spark, corpus, tmp_path):
    # scheme-less base normalizes to file: and goes through the Hadoop FS
    repo = IndexRepository(spark, str(tmp_path / "repo"))
    assert repo.base_uri.startswith("file:")
    idx = build_index(spark, spark.createDataFrame(corpus), _cfg())
    uri = repo.push(idx, "conv-bm25")
    assert uri.endswith("/conv-bm25")
    assert repo.exists("conv-bm25")
    pulled = repo.pull("conv-bm25")
    assert pulled.n_docs == idx.n_docs
    assert pulled.total_postings == idx.total_postings
    r1 = _results_map(score_queries(idx, _queries(spark), top_k=5))
    r2 = _results_map(score_queries(pulled, _queries(spark), top_k=5))
    assert r1 == r2


def test_bmx_kind_roundtrip_and_class_guard(spark, corpus, tmp_path):
    repo = IndexRepository(spark, str(tmp_path / "repo"))
    bmx = build_bmx_index(spark, spark.createDataFrame(corpus), _cfg())
    repo.push(bmx, "conv-bmx")
    assert repo.manifest("conv-bmx")["kind"] == "bmx"
    pulled = repo.pull("conv-bmx")
    assert isinstance(pulled, BMXIndex)
    r1 = _results_map(bmx_score_queries(bmx, _queries(spark), top_k=5))
    r2 = _results_map(bmx_score_queries(pulled, _queries(spark), top_k=5))
    assert r1 == r2
    # kind guard: a bmx save must not load through the bm25 facade
    with pytest.raises(TypeError, match="kind=bmx"):
        BM25SparkIndex.load_from_repository(spark, repo, "conv-bmx")
    eng = BMXSparkIndex.load_from_repository(spark, repo, "conv-bmx")
    assert isinstance(eng.index, BMXIndex)


def test_engine_push_and_load(spark, corpus, tmp_path):
    repo = IndexRepository(spark, str(tmp_path / "repo"))
    eng = BM25SparkIndex(spark, _cfg()).build(spark.createDataFrame(corpus))
    eng.push_to_repository(repo, "eng-idx")
    loaded = BM25SparkIndex.load_from_repository(spark, str(tmp_path / "repo"), "eng-idx")
    r1 = _results_map(eng.score_queries(_queries(spark), top_k=5))
    r2 = _results_map(loaded.score_queries(_queries(spark), top_k=5))
    assert r1 == r2
    with pytest.raises(RuntimeError, match="build"):
        BM25SparkIndex(spark, _cfg()).push_to_repository(repo, "nope")


def test_list_exists_delete(spark, corpus, tmp_path):
    repo = IndexRepository(spark, str(tmp_path / "repo"))
    assert repo.list_indexes() == []
    assert not repo.exists("missing")
    idx = build_index(spark, spark.createDataFrame(corpus), _cfg())
    repo.push(idx, "a-idx")
    repo.push(idx, "b.idx")
    assert repo.list_indexes() == ["a-idx", "b.idx"]
    assert repo.delete("a-idx")
    assert not repo.delete("a-idx")
    assert repo.list_indexes() == ["b.idx"]
    # a half-pushed index (no manifest) is invisible to the catalog
    (tmp_path / "repo" / "half").mkdir()
    assert repo.list_indexes() == ["b.idx"]
    assert not repo.exists("half")


def test_name_validation(spark, tmp_path):
    repo = IndexRepository(spark, str(tmp_path / "repo"))
    for bad in ["", "../escape", "a/b", ".hidden", "sp ace"]:
        with pytest.raises(ValueError, match="invalid index name"):
            repo.index_uri(bad)

"""Oracle self-checks: reproduce the reference's own scoring smoke tests
(reference tests/indices/sparse/model_test.py:14-85) on the vendored
pure-NumPy oracle before it is used as the parity target."""

from __future__ import annotations

import numpy as np
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.fixtures import CORPUS_A_KEYS, CORPUS_A_TEXTS
from baguetter_spark.oracle import OracleBM25Index, oracle_build_index
from baguetter_spark.oracle.bm25_ref import (
    oracle_calculate_scores_dense,
    oracle_top_k,
)

ALL_METHODS = ["robertson", "lucene", "atire", "bm25l", "bm25plus"]


@pytest.mark.parametrize("method", ALL_METHODS)
def test_journey_miles_ranks_doc2_first(method):
    """model_test.py:39-57 contract: query 'journey miles' at k=2 -> doc2."""
    cfg = SparseIndexConfig(method=method, idf_method=method)
    idx = OracleBM25Index(cfg).add_many(CORPUS_A_KEYS, CORPUS_A_TEXTS)
    keys, scores = idx.search("journey miles", top_k=2)
    assert keys[0] == "doc2"
    assert len(keys) == 2
    assert scores[0] >= scores[1]
    assert scores.dtype == np.float32


@pytest.mark.parametrize("method", ALL_METHODS)
def test_normalized_scores_monotonic(method):
    cfg = SparseIndexConfig(method=method, idf_method=method, normalize_scores=True)
    idx = OracleBM25Index(cfg).add_many(CORPUS_A_KEYS, CORPUS_A_TEXTS)
    keys, scores = idx.search("journey miles", top_k=3)
    assert keys[0] == "doc2"
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))


def test_vocabulary_is_sorted_rank():
    idx = oracle_build_index([["b", "a", "c"], ["a", "d"]])
    assert idx.vocabulary == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_csc_postings_docid_sorted():
    corpus = [["x", "y"], ["x"], ["x", "z"], ["y", "x"]]
    idx = oracle_build_index(corpus)
    x_id = idx.vocabulary["x"]
    start, end = idx.col_pointers[x_id], idx.col_pointers[x_id + 1]
    docs = idx.doc_indices[start:end]
    assert list(docs) == [0, 1, 2, 3]
    assert np.all(np.diff(docs) > 0)


def test_duplicate_query_tokens_double_count():
    corpus = [["a", "b"], ["b", "c"]]
    idx = oracle_build_index(corpus)
    tid = np.array([idx.vocabulary["b"]], dtype=np.int32)
    once = oracle_calculate_scores_dense(idx, tid)
    twice = oracle_calculate_scores_dense(idx, np.repeat(tid, 2))
    assert np.allclose(twice, once * 2, rtol=1e-6)


def test_weighted_equals_repeated_unit_weight():
    corpus = [["a", "b", "c"], ["b", "c"], ["c"]]
    idx = oracle_build_index(corpus)
    tids = np.array([idx.vocabulary["b"], idx.vocabulary["c"]], dtype=np.int32)
    unweighted = oracle_calculate_scores_dense(idx, tids)
    weighted = oracle_calculate_scores_dense(
        idx, tids, np.array([1.0, 1.0], dtype=np.float32)
    )
    assert np.array_equal(unweighted, weighted)


def test_top_k_clamps():
    scores = np.array([0.1, 0.5, 0.3], dtype=np.float32)
    s, i = oracle_top_k(scores, 10)
    assert len(s) == 3
    assert list(i[:2]) == [1, 2]


def test_oov_dropped_duplicates_kept():
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    idx = OracleBM25Index(cfg).add_many(["k1", "k2"], ["a b", "b c"])
    ids = idx.to_token_ids(["b", "zz_oov", "b", "a"])
    assert list(ids) == [idx.index.vocabulary["b"], idx.index.vocabulary["b"], idx.index.vocabulary["a"]]


def test_remove_rebuilds():
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    idx = OracleBM25Index(cfg).add_many(["k1", "k2", "k3"], ["a b", "b c", "c d"])
    idx.remove_many(["k2"])
    assert idx.key_mapping == {0: "k1", 1: "k3"}
    assert "b" in idx.index.vocabulary  # still in k1
    keys, _ = idx.search("d", top_k=1)
    assert keys == ["k3"]


def test_float32_discipline():
    idx = oracle_build_index([["a"] * 3 + ["b"], ["b", "c"]])
    assert idx.scores.dtype == np.float32
    assert idx.doc_indices.dtype == np.int32


def test_allow_negative_robertson_idf():
    """reference scoring.py:167-172: allow_negative skips the clamp-at-1 so
    terms with df > n/2 get negative idf."""
    import numpy as np

    from baguetter_spark.operators.indexer import idf_values

    df = np.array([9, 1])
    clamped = idf_values(df, 10, "robertson")
    neg = idf_values(df, 10, "robertson", allow_negative=True)
    assert clamped[0] == 0.0
    assert neg[0] < 0.0
    assert clamped[1] == neg[1] > 0.0

"""Pure-NumPy re-implementation of the reference BM25 index/scoring.

Semantics sources (all in /root/reference):
- formulas + build dataflow: `baguetter/indices/sparse/models/bm25/scoring.py`
  (tfc variants :101-161, idf variants :167-192, impact build :207-274,
  vocabulary :292-329)
- CSC assembly + query kernel: `baguetter/indices/sparse/models/bm25/index.py`
  (:50-147 build, :150-185 numba kernel, :188-221 wrapper)
- top-k: `baguetter/utils/numpy_utils.py:46-73`
- search/search_weighted/to_token_ids/normalize:
  `baguetter/indices/sparse/base.py:402-536`,
  `baguetter/indices/sparse/bm25.py:14-53`

Float discipline replicated exactly (verified float32-bit-equality targets):
- tf arrays are float32; doc-length scalars are Python floats (float64);
  NumPy value-based casting keeps `f32_array (op) py_float` in float32,
  identical to the reference's per-doc math.
- idf computed with `math.log` (float64) then *stored* into a float32 array.
- query scores accumulate into a float32 accumulator in query-token order
  (the numba kernel's `scores[doc] += data * weight`, index.py:179-185).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from baguetter_spark.config import (
    NON_OCCURRENCE_METHODS,
    SparseIndexConfig,
    TextPreprocessorConfig,
)
from baguetter_spark.functions.preprocess import make_processor

# --- TFC variants (scoring.py:101-161). tf_array is float32; scalars are
# Python floats so NumPy keeps float32 throughout, as in the reference. ---


def _tfc_robertson(tf, l_d, l_avg, k1, b, delta):
    return tf / (k1 * ((1 - b) + b * l_d / l_avg) + tf)


def _tfc_lucene(tf, l_d, l_avg, k1, b, delta):
    return _tfc_robertson(tf, l_d, l_avg, k1, b, delta)


def _tfc_atire(tf, l_d, l_avg, k1, b, delta):
    return (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * l_d / l_avg))


def _tfc_bm25l(tf, l_d, l_avg, k1, b, delta):
    c = tf / (1 - b + b * l_d / l_avg)
    return ((k1 + 1) * (c + delta)) / (k1 + c + delta)


def _tfc_bm25plus(tf, l_d, l_avg, k1, b, delta):
    num = (k1 + 1) * tf
    den = k1 * (1 - b + b * l_d / l_avg) + tf
    return (num / den) + delta


# --- IDF variants (scoring.py:167-192); float64 math. ---


def _idf_robertson(df, n_docs):
    inner = (n_docs - df + 0.5) / (df + 0.5)
    if inner < 1:
        inner = 1
    return math.log(inner)


def _idf_lucene(df, n_docs):
    return math.log(1 + (n_docs - df + 0.5) / (df + 0.5))


def _idf_atire(df, n_docs):
    return math.log(n_docs / df)


def _idf_bm25l(df, n_docs):
    return math.log((n_docs + 1) / (df + 0.5))


def _idf_bm25plus(df, n_docs):
    return math.log((n_docs + 1) / df)


TFC_FNS = {
    "robertson": _tfc_robertson,
    "lucene": _tfc_lucene,
    "atire": _tfc_atire,
    "bm25l": _tfc_bm25l,
    "bm25plus": _tfc_bm25plus,
}

IDF_FNS = {
    "robertson": _idf_robertson,
    "lucene": _idf_lucene,
    "atire": _idf_atire,
    "bm25l": _idf_bm25l,
    "bm25plus": _idf_bm25plus,
}

# Query-count normalization denominators (bm25.py:14-20)
NORMALIZATION_METHODS = {
    "lucene": lambda n: np.log(1 + (n - 0.5) / 1.5),
    "robertson": lambda n: np.log(1 + (n - 0.5) / 1.5),
    "atire": lambda n: np.log(n),
    "bm25l": lambda n: np.log((n + 1) / 1.5),
    "bm25plus": lambda n: np.log(n + 1),
}


@dataclass
class OracleBM25:
    """Mirror of the reference `BM25` dataclass (index.py:38-47)."""

    scores: np.ndarray  # float32, CSC data
    doc_indices: np.ndarray  # int32, CSC indices (docID-sorted per column)
    col_pointers: np.ndarray  # int32/int64, CSC indptr
    num_documents: int
    vocabulary: dict[str, int] = field(default_factory=dict)
    nonoccurrence_array: np.ndarray | None = None


def oracle_build_index(
    corpus_tokens: list[list[str]],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    delta: float = 0.5,
    method: str = "lucene",
    idf_method: str = "lucene",
    dtype: str = "float32",
    int_dtype: str = "int32",
) -> OracleBM25:
    """Replicates bm25.build_index (index.py:50-147) without scipy."""
    tfc_fn = TFC_FNS[method]
    idf_fn = IDF_FNS[idf_method]

    # vocabulary: term id = rank in sorted(unique tokens) (scoring.py:298-307)
    unique_tokens: set[str] = set()
    for toks in corpus_tokens:
        unique_tokens.update(toks)
    vocabulary = {t: i for i, t in enumerate(sorted(unique_tokens))}
    corpus_token_ids = [[vocabulary[t] for t in toks] for toks in corpus_tokens]

    # doc frequencies (scoring.py:318-327)
    doc_frequencies: dict[int, int] = dict.fromkeys(range(len(vocabulary)), 0)
    for doc_ids in corpus_token_ids:
        for tid in set(doc_ids):
            doc_frequencies[tid] += 1

    avg_doc_len = float(np.mean([len(d) for d in corpus_token_ids])) if corpus_token_ids else 0.0
    n_docs = len(corpus_token_ids)
    n_vocab = len(vocabulary)

    # nonoccurrence array (scoring.py:61-95): float64 math, float32 store
    nonoccurrence_array = None
    if method in NON_OCCURRENCE_METHODS:
        nonoccurrence_array = np.zeros(n_vocab, dtype=dtype)
        for tid, df in doc_frequencies.items():
            idf = idf_fn(df, n_docs)
            tfc = tfc_fn(0, avg_doc_len, avg_doc_len, k1, b, delta)
            nonoccurrence_array[tid] = idf * tfc

    # idf array (scoring.py:39-58): float64 computed, float32 stored
    idf_array = np.zeros(n_vocab, dtype=dtype)
    for tid, df in doc_frequencies.items():
        idf_array[tid] = idf_fn(df, n_docs)

    # impact triples (scoring.py:207-274)
    array_size = sum(doc_frequencies.values())
    scores = np.empty(array_size, dtype=dtype)
    doc_indices = np.empty(array_size, dtype=int_dtype)
    voc_indices = np.empty(array_size, dtype=int_dtype)
    i = 0
    for doc_idx, token_ids in enumerate(corpus_token_ids):
        doc_len = len(token_ids)
        counter = Counter(token_ids)
        voc_ind_doc = np.array(list(counter.keys()), dtype=int_dtype)
        tf_array = np.array(list(counter.values()), dtype=dtype)
        tfc = tfc_fn(tf_array, doc_len, avg_doc_len, k1, b, delta)
        idf = idf_array[voc_ind_doc]
        scores_doc = idf * tfc
        if nonoccurrence_array is not None:
            scores_doc = scores_doc - nonoccurrence_array[voc_ind_doc]
        n = len(scores_doc)
        scores[i : i + n] = scores_doc
        doc_indices[i : i + n] = doc_idx
        voc_indices[i : i + n] = voc_ind_doc
        i += n

    # CSC assembly without scipy (index.py:133-147): sort by (term, doc);
    # no duplicate (doc, term) pairs exist, so no summation step is needed.
    order = np.lexsort((doc_indices, voc_indices))
    data = scores[order]
    indices = doc_indices[order]
    indptr = np.zeros(n_vocab + 1, dtype=np.int64)
    counts = np.bincount(voc_indices, minlength=n_vocab)
    np.cumsum(counts, out=indptr[1:])

    return OracleBM25(
        scores=data,
        doc_indices=indices,
        col_pointers=indptr,
        num_documents=n_docs,
        vocabulary=vocabulary,
        nonoccurrence_array=nonoccurrence_array,
    )


def oracle_calculate_scores_dense(
    index: OracleBM25,
    token_ids: np.ndarray,
    token_weights: np.ndarray | None = None,
) -> np.ndarray:
    """Replicates the numba kernel `_calculate_scores_optimized`
    (index.py:150-185): float32 accumulator, query-token-order updates."""
    scores = np.zeros(index.num_documents, dtype=np.float32)
    for i, tid in enumerate(token_ids):
        start = index.col_pointers[tid]
        end = index.col_pointers[tid + 1]
        idx = index.doc_indices[start:end]
        contrib = index.scores[start:end]
        if token_weights is not None:
            contrib = contrib * np.float32(token_weights[i])
        # float32 += float32 is IEEE-correctly-rounded, identical to the
        # reference kernel's per-element accumulation (indices are unique
        # within one posting column, so fancy += is safe).
        scores[idx] += contrib
    return scores


def oracle_top_k(scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Replicates top_k_numpy (numpy_utils.py:46-73) including its
    argpartition/argsort tie behavior."""
    k = min(k, len(scores))
    top_k_indices = np.argpartition(scores, -k)[-k:]
    top_k_scores = scores[top_k_indices]
    sorted_indices = np.argsort(top_k_scores)[::-1]
    return top_k_scores[sorted_indices], top_k_indices[sorted_indices]


class OracleBM25Index:
    """API mirror of `BM25SparseIndex` backed by the NumPy oracle.

    Implements add_many / search / search_many / search_weighted /
    to_token_ids with the reference's exact semantics (base.py:258-536).
    """

    def __init__(self, config: SparseIndexConfig | None = None) -> None:
        self.config = config or SparseIndexConfig()
        self._process = make_processor(self.config.preprocessor)
        self.corpus_tokens: dict[str, list[str]] = {}
        self.key_mapping: dict[int, str] = {}
        self.index: OracleBM25 | None = None

    # -- build --
    def add_many(self, keys: list[str], values: list) -> OracleBM25Index:
        if len(keys) != len(set(keys)):
            msg = "Keys must be unique."
            raise ValueError(msg)
        if len(keys) != len(values):
            msg = "Number of keys and values must match."
            raise ValueError(msg)
        if not keys:
            return self
        tokenized = (
            values if values and isinstance(values[0], list) else [self._process(v) for v in values]
        )
        self.corpus_tokens.update(dict(zip(keys, tokenized, strict=True)))
        self.key_mapping = dict(enumerate(self.corpus_tokens.keys()))
        self.index = oracle_build_index(
            list(self.corpus_tokens.values()),
            k1=self.config.k1,
            b=self.config.b,
            delta=self.config.delta,
            method=self.config.method,
            idf_method=self.config.idf_method,
            dtype=self.config.dtype,
            int_dtype=self.config.int_dtype,
        )
        return self

    def remove_many(self, keys: list[str]) -> OracleBM25Index:
        for key in keys:
            self.corpus_tokens.pop(key, None)
        self.key_mapping = dict(enumerate(self.corpus_tokens.keys()))
        self.index = oracle_build_index(
            list(self.corpus_tokens.values()),
            k1=self.config.k1,
            b=self.config.b,
            delta=self.config.delta,
            method=self.config.method,
            idf_method=self.config.idf_method,
        )
        return self

    # -- query --
    def to_token_ids(self, tokens: list[str]) -> np.ndarray:
        """OOV silently dropped, duplicates kept in order (base.py:402-415)."""
        vocab = self.index.vocabulary
        return np.array(
            [vocab[t] for t in tokens if t in vocab], dtype=self.config.int_dtype
        )

    def _normalize(self, n_tokens: int, scores: np.ndarray) -> np.ndarray:
        if n_tokens == 0:
            return scores
        fn = NORMALIZATION_METHODS[self.config.method]
        return scores / (n_tokens * fn(n_tokens))

    def search(self, query, *, top_k: int = 100):
        tokens = self._process(query) if isinstance(query, str) else query
        token_ids = self.to_token_ids(tokens)
        dense = oracle_calculate_scores_dense(self.index, token_ids)
        top_scores, top_idx = oracle_top_k(dense, top_k)
        keys = [self.key_mapping[int(i)] for i in top_idx]
        scores = (
            self._normalize(len(token_ids), top_scores)
            if self.config.normalize_scores
            else top_scores
        )
        return keys, scores

    def search_many(self, queries, *, top_k: int = 100):
        return [self.search(q, top_k=top_k) for q in queries]

    def search_weighted(self, queries, query_weights, *, top_k: int = 100):
        """base.py:491-536: concat token ids, weights cast to float32."""
        if len(queries) == 0:
            return [], np.array([], dtype=np.float32)
        tokens_list = [
            self._process(q) if isinstance(q, str) else q for q in queries
        ]
        token_ids_list = [self.to_token_ids(t) for t in tokens_list]
        all_ids: list[int] = []
        all_weights: list[float] = []
        for ids, w in zip(token_ids_list, query_weights, strict=False):
            all_ids.extend(int(x) for x in ids)
            all_weights.extend([w] * len(ids))
        token_ids = np.array(all_ids, dtype=self.config.int_dtype)
        weights = np.array(all_weights, dtype=self.config.dtype)
        dense = oracle_calculate_scores_dense(self.index, token_ids, weights)
        top_scores, top_idx = oracle_top_k(dense, top_k)
        keys = [self.key_mapping[int(i)] for i in top_idx]
        scores = (
            self._normalize(len(all_ids), top_scores)
            if self.config.normalize_scores
            else top_scores
        )
        return keys, scores

"""Pure-NumPy re-implementation of the reference BMX index/scoring.

Semantics sources (all in /root/reference):
- build: `baguetter/indices/sparse/models/bmx/index.py:151-256`
  (CountVectorizer doc-term matrix :209-233, inverted index :151-183,
  doc_lens/relative_doc_lens :245-247)
- scoring: `baguetter/indices/sparse/models/bmx/index.py:36-148`
  (query-doc similarity :36-50, score kernel :105-148, wrapper :53-102)
- search API + normalization: `baguetter/indices/sparse/bmx.py:10-83`,
  `baguetter/indices/sparse/base.py:402-536`

Float discipline replicated exactly:
- ``idf`` computed with float32 df then stored float32 (index.py:171-172);
- ``entropy`` float64: ``p = 1/(1+exp(-tf))``, ``-sum(p*log p)`` over the
  docID-sorted tf array (index.py:175-176);
- ``doc_lens`` float32 (``np.asarray(..., dtype=dtype)``, index.py:245);
  ``avg_doc_len = float(np.mean(doc_lens))`` — a float32 pairwise mean
  (exact for integer-valued lens while the total stays < 2**24);
  ``relative_doc_lens = doc_lens / avg_doc_len`` stays float32;
- the score kernel accumulates float64 per-token contributions into a
  float32 accumulator in query-token order (``scores[ids] += f64``,
  index.py:143-146);
- ``min_df`` IS applied for BMX (bmx.py:51; unlike BM25) — the vocabulary
  and the doc lengths both come from the min_df-filtered doc-term matrix.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from baguetter_spark.config import SparseIndexConfig
from baguetter_spark.functions.preprocess import make_processor
from baguetter_spark.oracle.bm25_ref import oracle_top_k


@dataclass
class OracleBMX:
    """Mirror of the reference `BMX` dataclass (index.py:24-33)."""

    inverted_index: dict[int, dict]
    doc_lens: np.ndarray  # float32
    relative_doc_lens: np.ndarray  # float32
    avg_doc_len: float
    n_docs: int
    vocabulary: dict[str, int] = field(default_factory=dict)


def oracle_build_bmx(
    corpus_tokens: list[list[str]],
    *,
    min_df: int = 1,
    int_dtype: str = "int32",
    dtype: str = "float32",
) -> OracleBMX:
    """Replicates bmx.build_index (index.py:186-256) without sklearn.

    CountVectorizer semantics reproduced: vocabulary = sorted unique tokens
    with document frequency >= min_df; the doc-term matrix (and therefore
    doc_lens) covers only retained terms.
    """
    n_docs = len(corpus_tokens)

    df_counter: Counter[str] = Counter()
    for toks in corpus_tokens:
        df_counter.update(set(toks))
    kept = sorted(t for t, c in df_counter.items() if c >= min_df)
    vocabulary = {t: i for i, t in enumerate(kept)}

    # per-term postings: docID-ascending (CSR of the transposed matrix)
    postings: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(kept))}
    doc_lens = np.zeros(n_docs, dtype=dtype)
    for doc_idx, toks in enumerate(corpus_tokens):
        counts = Counter(toks)
        total = 0
        for term, tf in counts.items():
            tid = vocabulary.get(term)
            if tid is None:
                continue
            postings[tid].append((doc_idx, tf))
            total += tf
        doc_lens[doc_idx] = total

    inverted_index: dict[int, dict] = {}
    for tid, plist in postings.items():
        plist.sort()
        ids = np.array([d for d, _ in plist], dtype=int_dtype)
        tf = np.array([t for _, t in plist], dtype=int_dtype)
        df = np.float32(len(ids))
        idf = np.float32(np.log(1.0 + (((n_docs - df) + 0.5) / (df + 0.5))))
        p = 1 / (1 + np.exp(-tf))
        entropy = -np.sum(p * np.log(p))
        inverted_index[tid] = {"doc_ids": ids, "tf": tf, "idf": idf, "entropy": entropy}

    avg_doc_len = float(np.mean(doc_lens)) if n_docs else 0.0
    relative_doc_lens = doc_lens / avg_doc_len if n_docs else doc_lens

    return OracleBMX(
        inverted_index=inverted_index,
        doc_lens=doc_lens,
        relative_doc_lens=relative_doc_lens,
        avg_doc_len=avg_doc_len,
        n_docs=n_docs,
        vocabulary=vocabulary,
    )


def oracle_bmx_scores_dense(
    index: OracleBMX,
    token_ids: np.ndarray,
    token_weights: np.ndarray | None = None,
    alpha: float | None = None,
    beta: float | None = None,
    dtype: str = "float32",
) -> np.ndarray:
    """Replicates calculate_scores + the numba kernel (index.py:53-148),
    including the duplicate-token counting in query-doc similarity."""
    query_len = len(token_ids)
    if query_len == 0:
        return np.zeros(index.n_docs, dtype=dtype)

    doc_ids = [index.inverted_index[t]["doc_ids"] for t in token_ids]
    term_freqs = [index.inverted_index[t]["tf"] for t in token_ids]
    term_idfs = [index.inverted_index[t]["idf"] for t in token_ids]
    term_entropies = [index.inverted_index[t]["entropy"] for t in token_ids]

    # compute_query_doc_similarity (index.py:36-50): float32 count array
    count = np.zeros(index.n_docs, dtype=np.dtype(dtype))
    for ids in doc_ids:
        count[ids] += 1
    count /= query_len
    sims = [count[ids] for ids in doc_ids]

    # _calculate_scores (index.py:105-148).  The reference kernel is
    # @nb.njit: numba uses TYPE-based promotion (f32 array ∘ f64 scalar
    # -> f64), unlike numpy<2's value-based casting which would keep
    # ``alpha * relative_doc_lens`` in float32 — so every term of the
    # contribution is computed in float64 here, then accumulated into the
    # float32 scores array (``scores[ids] += f64`` rounds at the store).
    entropy = np.asarray(term_entropies)
    entropy = entropy / np.max(entropy)
    if alpha is None:
        alpha = max(min(1.5, index.avg_doc_len / 100), 0.5)
    if beta is None:
        beta = 1 / np.log(1 + index.n_docs)
    avg_entropy = float(np.mean(entropy))

    scores = np.zeros(index.n_docs, dtype=np.dtype(dtype))
    for i in range(len(term_freqs)):
        w = float(token_weights[i]) if token_weights is not None else 1.0
        ids = doc_ids[i]
        freqs = term_freqs[i].astype(np.float64)
        idf = float(term_idfs[i])
        rel = index.relative_doc_lens[ids].astype(np.float64)
        sim = sims[i].astype(np.float64)
        scores[ids] += w * (
            idf * ((freqs * (alpha + 1.0)) / (freqs + alpha * rel + alpha * avg_entropy))
            + sim * entropy[i] * beta
        )
    return scores


class OracleBMXIndex:
    """API mirror of `BMXSparseIndex` backed by the NumPy oracle
    (bmx.py:10-83 + base.py:258-536)."""

    def __init__(self, config: SparseIndexConfig | None = None) -> None:
        self.config = config or SparseIndexConfig()
        self._process = make_processor(self.config.preprocessor)
        self.corpus_tokens: dict[str, list[str]] = {}
        self.key_mapping: dict[int, str] = {}
        self.index: OracleBMX | None = None

    def add_many(self, keys: list[str], values: list) -> OracleBMXIndex:
        tokenized = (
            values if values and isinstance(values[0], list) else [self._process(v) for v in values]
        )
        self.corpus_tokens.update(dict(zip(keys, tokenized, strict=True)))
        self.key_mapping = dict(enumerate(self.corpus_tokens.keys()))
        self.index = oracle_build_bmx(
            list(self.corpus_tokens.values()),
            min_df=self.config.min_df,
            int_dtype=self.config.int_dtype,
            dtype=self.config.dtype,
        )
        return self

    def to_token_ids(self, tokens: list[str]) -> np.ndarray:
        vocab = self.index.vocabulary
        return np.array(
            [vocab[t] for t in tokens if t in vocab], dtype=self.config.int_dtype
        )

    def _normalize(self, n_tokens: int, scores: np.ndarray) -> np.ndarray:
        """BMXSparseIndex.normalize_scores (bmx.py:17-33)."""
        if n_tokens == 0:
            return scores
        corpus_size = len(self.corpus_tokens)
        factor = n_tokens * np.log(1 + (corpus_size - 0.5) / 1.5)
        return scores / factor

    def search(self, query, *, top_k: int = 100):
        tokens = self._process(query) if isinstance(query, str) else query
        token_ids = self.to_token_ids(tokens)
        dense = oracle_bmx_scores_dense(
            self.index,
            token_ids,
            alpha=self.config.alpha,
            beta=self.config.beta,
            dtype=self.config.dtype,
        )
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
        """base.py:491-536 with the BMX kernel."""
        if len(queries) == 0:
            return [], np.array([], dtype=np.float32)
        tokens_list = [self._process(q) if isinstance(q, str) else q for q in queries]
        token_ids_list = [self.to_token_ids(t) for t in tokens_list]
        all_ids: list[int] = []
        all_weights: list[float] = []
        for ids, w in zip(token_ids_list, query_weights, strict=False):
            all_ids.extend(int(x) for x in ids)
            all_weights.extend([w] * len(ids))
        token_ids = np.array(all_ids, dtype=self.config.int_dtype)
        weights = np.array(all_weights, dtype=self.config.dtype)
        dense = oracle_bmx_scores_dense(
            self.index,
            token_ids,
            weights,
            alpha=self.config.alpha,
            beta=self.config.beta,
            dtype=self.config.dtype,
        )
        top_scores, top_idx = oracle_top_k(dense, top_k)
        keys = [self.key_mapping[int(i)] for i in top_idx]
        scores = (
            self._normalize(len(all_ids), top_scores)
            if self.config.normalize_scores
            else top_scores
        )
        return keys, scores

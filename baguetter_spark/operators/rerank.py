"""Distributed candidate reranking: the Spark counterpart of the
reference's cross-encoder post-processing surface.

Reference semantics (``utils/model_helpers.py:117-176``
``create_post_processing_fn`` + ``indices/search_engine.py:178-180``):
flatten (query, document) pairs across all result lists, score every
pair with ``reranking_model.rank`` in batches, then re-sort each result
list by the new score descending.  That is a driver-side loop over
in-memory lists — at 100 TB the candidate set for a query batch is a
DataFrame, so the Spark-first re-expression is:

- candidates stay distributed: ``(query_id, query_text, doc_id,
  doc_text, ...)`` rows, however the retriever produced them (BM25 /
  BMX / dense top-k, typically a few hundred rows per query);
- scoring is ONE Arrow-batched ``mapInPandas`` pass with a pluggable
  pair scorer — the model slot.  Batches arrive as pandas frames, so a
  real cross-encoder would run its forward pass per Arrow batch
  (the same batch shape ``model.rank`` consumes in the reference);
- the re-sort is the engine's two-phase :func:`per_query_topk`
  (bounded per-partition state — no single-task straggler when one
  query carries a hot candidate set).

No model runtime ships in this container (documented, same policy as
``operators/multimodal.py``), so :func:`cross_encoder_scorer` raises
with guidance unless a callable model is injected, and
:func:`token_overlap_scorer` is the deterministic, SQL-expressible
stand-in that the gate row ``rerank_token_overlap`` verifies end-to-end
against the DuckDB oracle.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# A pair scorer maps equal-length (query_texts, doc_texts) series to one
# float score per pair; higher = better.  It runs inside executors, once
# per Arrow batch.
PairScorer = Callable[[pd.Series, pd.Series], np.ndarray]


def _token_set(text: str) -> frozenset[str]:
    # str.split() == split on any whitespace run, drop empties — the
    # oracle mirrors this with string_split_regex('[ \t\n]+') + <> ''.
    return frozenset(text.lower().split())


def token_overlap_scorer(query_texts: pd.Series, doc_texts: pd.Series) -> np.ndarray:
    """Deterministic default scorer: |q-tokens ∩ d-tokens| / |q-tokens|.

    Distinct-token overlap is the classic zero-model relevance proxy; it
    exists so the rerank *plumbing* (Arrow batch shape, score column,
    two-phase re-sort, tie order) is verifiable bit-for-bit against a
    SQL oracle without a model runtime.  Queries repeat once per
    candidate, so their token sets are memoized per batch.
    """
    qcache: dict[str, frozenset[str]] = {}
    out = np.zeros(len(query_texts), dtype=np.float64)
    for i, (q, d) in enumerate(zip(query_texts.tolist(), doc_texts.tolist())):
        qtoks = qcache.get(q)
        if qtoks is None:
            qtoks = qcache[q] = _token_set(q or "")
        if not qtoks:
            continue
        out[i] = len(qtoks & _token_set(d or "")) / len(qtoks)
    return out


def cross_encoder_scorer(model=None, *, batch_size: int = 32) -> PairScorer:
    """Model slot mirroring ``create_post_processing_fn(reranking_model)``.

    ``model`` must expose ``predict(list[tuple[str, str]]) -> array`` (the
    sentence-transformers CrossEncoder surface the reference wraps).  No
    model runtime is installed in this container, so constructing the
    scorer without one raises immediately — same policy as the multimodal
    decode slot (``operators/multimodal.py``).  Use
    :func:`token_overlap_scorer` for a deterministic stand-in.
    """
    if model is None:
        msg = (
            "no cross-encoder runtime in this container; pass a model with "
            ".predict(list[(query, doc)]) (e.g. a sentence-transformers "
            "CrossEncoder) or use token_overlap_scorer"
        )
        raise NotImplementedError(msg)

    def score(query_texts: pd.Series, doc_texts: pd.Series) -> np.ndarray:
        pairs = list(zip(query_texts.tolist(), doc_texts.tolist()))
        scores: list[np.ndarray] = []
        for lo in range(0, len(pairs), batch_size):
            scores.append(np.asarray(model.predict(pairs[lo : lo + batch_size])))
        return np.concatenate(scores) if scores else np.zeros(0)

    return score


def score_pairs(
    candidates: DataFrame,
    scorer: PairScorer,
    *,
    query_col: str = "query_text",
    doc_col: str = "doc_text",
    out_col: str = "rerank_score",
) -> DataFrame:
    """Append ``out_col`` (double) to ``candidates`` via one Arrow pass.

    All input columns are preserved — the caller decides what survives
    the re-sort (typically drops ``doc_text`` after scoring so full
    document bodies never cross the top-k shuffle).
    """
    schema = T.StructType(
        list(candidates.schema) + [T.StructField(out_col, T.DoubleType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf[out_col] = pd.Series(dtype=np.float64)
            else:
                pdf[out_col] = scorer(pdf[query_col], pdf[doc_col])
            yield pdf

    return candidates.mapInPandas(run, schema=schema)


def rerank_topk(
    candidates: DataFrame,
    scorer: PairScorer,
    *,
    top_k: int,
    id_col: str = "doc_id",
    query_col: str = "query_text",
    doc_col: str = "doc_text",
    keep_doc_text: bool = False,
) -> DataFrame:
    """Score candidate pairs and keep each query's top ``top_k``.

    Output: the candidate columns (minus ``doc_col`` and ``query_col``
    unless ``keep_doc_text``) plus ``rerank_score``, in the engine's
    canonical tie order (score desc, ``id_col`` asc) via the two-phase
    :func:`~baguetter_spark.operators.search.per_query_topk`.  Document
    bodies are dropped BEFORE the top-k shuffle by default: at scale the
    scored-candidate table is (ids, score) — text never re-shuffles.
    """
    from baguetter_spark.operators.search import per_query_topk

    scored = score_pairs(candidates, scorer, query_col=query_col, doc_col=doc_col)
    if not keep_doc_text:
        scored = scored.drop(doc_col, query_col)
    return per_query_topk(scored, top_k, id_col=id_col, score_col="rerank_score")

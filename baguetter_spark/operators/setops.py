"""Posting-list set operations + score normalization helpers.

The reference implements numba merge kernels over sorted int arrays
(`baguetter/utils/numba_utils.py`: union_sorted :31-89, intersect_sorted
:93-140, diff_sorted :144-177, concat1d :181-200, get_min_max :7-27,
get_indices :203-231) and numpy min-max normalization
(`baguetter/utils/numpy_utils.py:8-43`).  Spark-side these are array
functions / relational set ops; the numpy forms are kept for in-kernel use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- numpy kernel forms (used inside pandas UDFs) ---------------------------


def union_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.union1d(a, b)


def intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.intersect1d(a, b, assume_unique=True)


def diff_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.setdiff1d(a, b, assume_unique=True)


def min_max_normalization(
    scores: np.ndarray, min_max: tuple[float, float] | None = None
) -> np.ndarray:
    """numpy_utils.py:27-43 semantics incl. the 1e-9 denominator floor."""
    mn, mx = min_max if min_max else (scores.min(), scores.max())
    return (scores - mn) / max(mx - mn, 1e-9)


def reversed_min_max_normalization(
    scores: np.ndarray, min_max: tuple[float, float] | None = None
) -> np.ndarray:
    """numpy_utils.py:8-24."""
    mn, mx = min_max if min_max else (scores.min(), scores.max())
    return (mx - scores) / max(mx - mn, 1e-9)


# --- relational forms (posting lists as DataFrames of doc ids) -------------


def term_doc_sets(index, terms: list[str]) -> DataFrame:
    """(term, doc_idx) rows for the given terms, straight from the posting
    blocks (decoded) — the relational form of a posting-list gather."""
    from typing import Iterator

    import pandas as pd

    from baguetter_spark.compress import decode_doc_ids

    wanted = index.vocab.where(F.col("term").isin(terms)).select("term_id", "term")
    blocks = index.postings.join(F.broadcast(wanted), "term_id")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms_out, docs = [], []
            for term, n, buf in zip(pdf["term"], pdf["n_postings"], pdf["doc_ids_delta"]):
                ids = decode_doc_ids(buf, int(n))
                terms_out.append(np.full(len(ids), term, dtype=object))
                docs.append(ids)
            yield pd.DataFrame(
                {"term": np.concatenate(terms_out), "doc_idx": np.concatenate(docs)}
            )

    return blocks.mapInPandas(decode, schema="term string, doc_idx long")


def posting_union(index, term_a: str, term_b: str) -> DataFrame:
    sets = term_doc_sets(index, [term_a, term_b])
    return sets.select("doc_idx").distinct()


def posting_intersect(index, term_a: str, term_b: str) -> DataFrame:
    sets = term_doc_sets(index, [term_a, term_b])
    a = sets.where(F.col("term") == term_a).select("doc_idx")
    b = sets.where(F.col("term") == term_b).select("doc_idx")
    return a.intersect(b)


def posting_diff(index, term_a: str, term_b: str) -> DataFrame:
    sets = term_doc_sets(index, [term_a, term_b])
    a = sets.where(F.col("term") == term_a).select("doc_idx")
    b = sets.where(F.col("term") == term_b).select("doc_idx")
    return a.exceptAll(b).distinct()

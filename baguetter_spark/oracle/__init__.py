"""Vendored pure-NumPy reference oracle (reimplements baguetter BM25 semantics 1:1).

The reference package itself cannot run in this sandbox (numba/scipy/nltk are
not installable offline), so differential tests compare the Spark engine to
this oracle, which reproduces `baguetter/indices/sparse/models/bm25/{scoring,
index}.py` math exactly: float32 impact arrays, float64 idf computed then
stored float32, CSC assembly (via lexsort instead of scipy), query-token-order
float32 score accumulation, and argpartition top-k.
"""

from baguetter_spark.oracle.bm25_ref import OracleBM25Index, oracle_build_index

__all__ = ["OracleBM25Index", "oracle_build_index"]

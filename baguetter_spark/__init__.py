"""baguetter_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of
mixedbread-ai/baguetter (reference at /root/reference, read-only): text
preprocessing, BM25 (5 method/idf variants) inverted-index construction,
batch top-k search (exhaustive + block-max WAND), rank fusion, posting-list
set ops — plus the large-scale training-data operators a 100 TB pipeline
needs (dedup, similarity search, text analysis, multimodal plumbing).

Architecture is idiomatic PySpark: DataFrame/SQL declarative plans,
Arrow-vectorized pandas UDFs for the kernels, term-range-blocked posting
tables to bound shuffle skew, and checkpoint-resumable stages.
"""

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig

__version__ = "0.1.0"

__all__ = [
    "SparseIndexConfig",
    "TextPreprocessorConfig",
    "__version__",
]

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


def __getattr__(name: str):
    # The engine facades import pyspark/pandas at module load; exposing them
    # lazily keeps `import baguetter_spark` cheap for config-only consumers
    # while matching the reference's `from baguetter.indices import
    # BMXSparseIndex` ergonomics at the package root.
    lazy = {
        "BM25SparkIndex": ("baguetter_spark.engine", "BM25SparkIndex"),
        "BMXSparkIndex": ("baguetter_spark.engine", "BMXSparkIndex"),
        "DenseSparkIndex": ("baguetter_spark.dense", "DenseSparkIndex"),
        "MultiSparkIndex": ("baguetter_spark.multi", "MultiSparkIndex"),
        "SparkSearchEngine": ("baguetter_spark.multi", "SparkSearchEngine"),
        "IndexRepository": ("baguetter_spark.repository", "IndexRepository"),
        "merge_indexes": ("baguetter_spark.merge", "merge_indexes"),
        "remove_docs": ("baguetter_spark.merge", "remove_docs"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    msg = f"module 'baguetter_spark' has no attribute {name!r}"
    raise AttributeError(msg)


__version__ = "0.1.0"

__all__ = [
    "BM25SparkIndex",
    "BMXSparkIndex",
    "DenseSparkIndex",
    "IndexRepository",
    "MultiSparkIndex",
    "SparkSearchEngine",
    "SparseIndexConfig",
    "TextPreprocessorConfig",
    "__version__",
    "merge_indexes",
    "remove_docs",
]

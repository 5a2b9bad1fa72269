"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001.
``queries()`` / ``oracle_sql()`` — operator-by-operator correctness gate
(Spark engine vs DuckDB SQL); implementations live in
``baguetter_spark.gate`` (BM25 core) and grow as operators land.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the BM25 index over sf0.001 documents and run
    the gate query batch (lucene defaults), returning top-10 per query."""
    from baguetter_spark.gate import bm25_topk_query

    return bm25_topk_query("lucene")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from baguetter_spark.gate import gate_queries

    return gate_queries()


def oracle_sql() -> dict[str, str]:
    from baguetter_spark.gate import gate_oracle_sql

    return gate_oracle_sql()

"""zip_with_index correctness under multi-partition + AQE conditions
(regression: AQE re-coalescing between the counts pass and the assignment
pass corrupted offsets before the persist() pin)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from baguetter_spark.operators.zipindex import zip_with_index


def test_dense_unique_and_order(spark):
    n = 50_000
    rng = np.random.default_rng(0)
    keys = rng.permutation(n)
    df = spark.createDataFrame(
        pd.DataFrame({"k": [f"key{x:08d}" for x in keys], "v": keys})
    )
    out = zip_with_index(df, ["k"], "idx", num_partitions=16).toPandas()
    assert len(out) == n
    # dense 0..n-1
    assert sorted(out["idx"]) == list(range(n))
    # idx == rank of k
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["idx"]) == list(range(n))


def test_two_column_order(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": ["b", "a", "a", "b", "a"],
                "b": [1, 2, 1, 0, 3],
            }
        )
    )
    out = zip_with_index(df, ["a", "b"], "idx").toPandas()
    m = {(r["a"], r["b"]): r["idx"] for _, r in out.iterrows()}
    assert m == {("a", 1): 0, ("a", 2): 1, ("a", 3): 2, ("b", 0): 3, ("b", 1): 4}

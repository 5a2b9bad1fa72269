"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side ``zip_with``/``aggregate`` dot products
  against a broadcast query set — the exact baseline;
- LSH-bucketed ANN: deterministic random-hyperplane sign buckets (integer
  pseudo-noise planes so the DuckDB oracle reproduces them exactly), exact
  cosine within candidate buckets — the scale path (bucket join instead of
  the full cross product).

Scale notes: brute force is O(Q x N) — fine for small Q with a broadcast
query matrix; at 10^9+ vectors the LSH variant turns it into a per-bucket
join.  The reference's dense indexes (usearch/faiss HNSW,
`baguetter/indices/dense/usearch.py:47-417`) are native ANN libraries; this
is the Spark-native equivalent slot (MultiIndex-compatible by producing the
same results shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
PLANE_A = [3 * p + 1 for p in range(N_PLANES)]
PLANE_B = [7 * p + 3 for p in range(N_PLANES)]
PLANE_MOD = 97
PLANE_SHIFT = 48  # plane[d] = ((a*d + b) % 97) - 48  in [-48, 48]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every vector vs the given query vectors.

    (query_id, rank, vec_id, cos_r): rank on the 6-dp-rounded cosine with
    vec_id tie-break; self-matches excluded."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    cos = _dot(F.col(vec_col), F.col("qvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qvec"))
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cos, 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_r")
    )


def lsh_bucket(vec_col, dim: int):
    """Sign-bucket id over N_PLANES deterministic integer hyperplanes:
    bucket = sum_p 2^p * [dot(plane_p, v) > 0]."""
    def _plane_term(a, b):
        return lambda x, d: x * (
            (F.lit(a) * d + F.lit(b)) % F.lit(PLANE_MOD) - F.lit(PLANE_SHIFT)
        ).cast("double")

    bucket = F.lit(0).cast("long")
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                _plane_term(PLANE_A[p], PLANE_B[p]),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane sign
    bucket; exact cosine within the bucket.  Deterministic (integer planes);
    recall < 1 by design — the oracle computes the identical procedure."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    emb_b = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim).alias("bucket"),
    )
    q = emb_b.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket"),
    )
    joined = emb_b.join(F.broadcast(q), "bucket").where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("vec"), F.col("qvec")) / (_norm(F.col("vec")) * _norm(F.col("qvec")))
    scored = joined.select(
        "query_id", "vec_id", F.round(cos, 6).alias("cos_r")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_r")
    )

"""Dense vector index facade: the Spark-native slot for the reference's
dense indexes (`baguetter/indices/dense/usearch.py:47-417`,
`.../dense/faiss.py:26-150`, catalogued in SURVEY §2.8).

The reference wraps native ANN libraries (usearch HNSW / faiss).  Neither
ships in this sandbox, and on a cluster the Spark-native equivalent is a
scan-and-score plan anyway: exact top-k = broadcast query matrix x embedding
DataFrame (JVM `zip_with`/`aggregate` dot products), approximate top-k =
LSH sign-bucket join (operators/similarity.py).  This facade gives that
plan the reference's index API (add_many / remove_many / search /
search_many) and the engine-standard `score_queries(queries_df)` so it
composes with MultiSparkIndex for hybrid sparse+dense retrieval
(reference `MultiIndex`, mutli.py:18-203).

Score normalization mirrors the reference's distance->score mapping
(usearch.py:23-44): cosine -> 1 - cos_distance == cosine similarity;
inner-product -> the raw dot product; l2sq -> negated squared distance
(descending score == the reference's ascending-distance order); the
bitwise metrics (hamming / jaccard / tanimoto / sorensen — the reference
b1 dtype surface) -> similarities per operators/binary_sim.py's contract,
each a strictly decreasing function of the usearch distance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_METRICS = ("cosine", "ip", "l2sq", "hamming", "jaccard", "tanimoto", "sorensen")
# metrics scored over sign-quantized packed bits (reference b1 dtype,
# usearch.py:23-44) — see operators/binary_sim.py for the score contract
_BINARY_METRICS = ("hamming", "jaccard", "tanimoto", "sorensen")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


class DenseSparkIndex:
    """Exact (brute-force) dense top-k with the reference dense-index API.

    State is a vectors DataFrame ``(doc_id: string, vector: array<double>)``.
    For billion-vector corpora swap `score_queries` for the LSH-bucketed
    variant (`operators/similarity.ann_lsh_topk`) — same result shape.
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        metric: str = "cosine",
        use_lsh: bool = False,
    ) -> None:
        if metric not in _METRICS:
            msg = f"unsupported metric {metric!r}; choose from {_METRICS}"
            raise ValueError(msg)
        if use_lsh and metric not in ("cosine", "ip"):
            msg = f"use_lsh (sign-plane angular buckets) requires cosine/ip, not {metric!r}"
            raise ValueError(msg)
        self.spark = spark
        self.metric = metric
        self.use_lsh = use_lsh
        self.vectors: DataFrame | None = None

    @property
    def synthetic_turn_suffix(self) -> bool:
        """False: dense doc ids are the caller's raw keys (no turn suffix)."""
        return False

    # ------------------------------------------------------------------ build
    def build(self, vectors: DataFrame) -> DenseSparkIndex:
        """DataFrame-native build: (doc_id, vector)."""
        self.vectors = vectors.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("vector").cast("array<double>").alias("vector"),
        ).persist()
        return self

    def add_many(self, keys: list[str], vectors: list[list[float]]) -> DenseSparkIndex:
        if len(keys) != len(set(keys)):
            msg = "Keys must be unique."
            raise ValueError(msg)
        new = self.spark.createDataFrame(
            pd.DataFrame({"doc_id": keys, "vector": vectors})
        )
        if self.vectors is None:
            return self.build(new)
        kept = self.vectors.join(new.select("doc_id"), "doc_id", "left_anti")
        return self.build(kept.unionByName(new.select("doc_id", "vector")))

    def remove_many(self, keys: list[str]) -> DenseSparkIndex:
        if self.vectors is not None:
            self.vectors = self.vectors.where(~F.col("doc_id").isin(keys)).persist()
        return self

    def _radius_floor(self, radius: float, dim: int):
        """Translate the reference's distance-domain ``radius``
        (usearch.py:232-326 ``search(..., radius=math.inf)``) into a floor on
        this engine's score domain, per metric:

        cosine: cos_distance = 1 - cos      -> score >= 1 - radius
        ip:     distance = 1 - dot (usearch's ip kernel: d = 1 - <a,b>)
                                            -> score (= dot) >= 1 - radius
        l2sq:   distance = sum((x-y)^2)     -> score (= -dist) >= -radius
        hamming: distance = popcount(xor)   -> score >= 1 - radius/dim
        jaccard/tanimoto/sorensen: distance = 1 - similarity
                                            -> score >= 1 - radius
        """
        if self.metric == "l2sq":
            return -radius
        if self.metric == "hamming":
            return 1.0 - radius / float(dim)
        return 1.0 - radius

    # ----------------------------------------------------------------- search
    def score_queries(
        self,
        queries: DataFrame,
        *,
        top_k: int = 100,
        radius: float = float("inf"),
        exact_search: bool | None = None,
    ) -> DataFrame:
        """queries(query_id, vector) -> (query_id, rank, doc_id, score).

        Broadcast the (small) query matrix across the embedding scan — one
        narrow stage, no shuffle until the per-query window top-k.  A finite
        ``radius`` (reference usearch search param, distance domain) drops
        every candidate beyond it BEFORE ranking — the selective predicate
        runs scan-side, so a tight radius also shrinks the top-k shuffle.
        ``exact_search`` overrides the index's ``use_lsh`` default per call
        (reference usearch.py:232-240: ``If None, uses the index's default``):
        True forces the exact brute scan, False the LSH-bucketed approximate
        path (angular metrics only).
        """
        if self.vectors is None:
            msg = "DenseSparkIndex is empty: call build()/add_many() before searching"
            raise RuntimeError(msg)
        first = self.vectors.select("vector").first()
        if first is None:
            msg = "DenseSparkIndex has no vectors: add documents before searching"
            raise RuntimeError(msg)
        q = queries.select("query_id", F.col("vector").cast("array<double>").alias("qvec"))
        # dimension guard: a mismatched query vector would otherwise produce
        # silent null scores (zip_with null-pads) — fail loudly instead
        dim = len(first[0])
        q = q.withColumn(
            "__dimchk",
            F.assert_true(
                F.size("qvec") == dim,
                F.concat(
                    F.lit(f"query vector dimension != index dimension {dim}: got "),
                    F.size("qvec").cast("string"),
                ),
            ),
        ).drop("__dimchk")
        use_lsh = self.use_lsh if exact_search is None else not exact_search
        if use_lsh and self.metric not in ("cosine", "ip"):
            msg = (
                "exact_search=False (sign-plane angular LSH) requires "
                f"cosine/ip, not {self.metric!r}"
            )
            raise ValueError(msg)
        if use_lsh:
            from baguetter_spark.operators.similarity import lsh_bucket

            emb = self.vectors.withColumn("bucket", lsh_bucket(F.col("vector"), dim))
            qb = q.withColumn("bucket", lsh_bucket(F.col("qvec"), dim))
            joined = emb.join(F.broadcast(qb), "bucket")
        elif self.metric in _BINARY_METRICS:
            # pack BEFORE the join: one quantize pass per side; the pair scan
            # then touches only the 32x-smaller packed words (never re-packs
            # per pair — Catalyst does not CSE across join inputs)
            from baguetter_spark.operators.binary_sim import pack_bits

            packed = self.vectors.select(
                "doc_id", pack_bits(F.col("vector"), dim).alias("vector")
            )
            qp = q.select("query_id", pack_bits(F.col("qvec"), dim).alias("qvec"))
            joined = packed.crossJoin(F.broadcast(qp))
        else:
            joined = self.vectors.crossJoin(F.broadcast(q))

        if self.metric == "cosine":
            # try_divide: a zero-norm doc/query vector yields NULL (ANSI mode
            # would throw on 0/0; non-ANSI would yield NaN, which Spark ranks
            # ABOVE every real number) — filtered out below
            score = F.try_divide(
                _dot(F.col("vector"), F.col("qvec")),
                _norm(F.col("vector")) * _norm(F.col("qvec")),
            )
        elif self.metric == "ip":
            score = _dot(F.col("vector"), F.col("qvec"))
        elif self.metric == "l2sq":
            # negated squared distance: descending score == ascending
            # distance (reference L2sq order); monotone, rank-identical
            diff = F.zip_with(F.col("vector"), F.col("qvec"), lambda x, y: x - y)
            score = -F.aggregate(
                F.transform(diff, lambda d: d * d), F.lit(0.0), lambda s, x: s + x
            )
        else:  # sign-quantized bitwise metrics (reference b1 dtype);
            # vector/qvec are already packed words (see join branch above)
            from baguetter_spark.operators.binary_sim import binary_score

            score = binary_score(
                F.col("vector"), F.col("qvec"), self.metric, dim
            )

        scored = joined.select("query_id", "doc_id", score.alias("score"))
        # drop zero-norm / empty-bitset casualties instead of letting them
        # poison the top-k (binary try_divide ratios yield NULL on 0/0)
        if self.metric in ("cosine", *_BINARY_METRICS):
            scored = scored.where(
                F.col("score").isNotNull() & ~F.isnan(F.col("score"))
            )
        if radius != float("inf"):
            scored = scored.where(F.col("score") >= self._radius_floor(radius, dim))
        # two-phase rank-safe top-k (operators/search.per_query_topk): no
        # full-partition window — hot-query straggler defense at 10^9 vectors
        from baguetter_spark.operators.search import per_query_topk

        topped = per_query_topk(scored, top_k, id_col="doc_id")
        return topped.select("query_id", "rank", "doc_id", "score")

    def search_many(
        self,
        query_vectors: list[list[float]],
        *,
        top_k: int = 100,
        radius: float = float("inf"),
        exact_search: bool | None = None,
    ):
        qdf = self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [f"q{i}" for i in range(len(query_vectors))],
                    "vector": query_vectors,
                }
            )
        )
        rows = self.score_queries(
            qdf, top_k=top_k, radius=radius, exact_search=exact_search
        ).collect()
        by_q: dict[str, list] = {f"q{i}": [] for i in range(len(query_vectors))}
        for r in rows:
            by_q[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
        out = []
        for i in range(len(query_vectors)):
            entries = sorted(by_q[f"q{i}"])
            out.append(([d for _, d, _ in entries], [s for _, _, s in entries]))
        return out

    def search(
        self,
        query_vector: list[float],
        *,
        top_k: int = 100,
        radius: float = float("inf"),
        exact_search: bool | None = None,
    ):
        return self.search_many(
            [query_vector], top_k=top_k, radius=radius, exact_search=exact_search
        )[0]

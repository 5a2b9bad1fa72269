"""Binary (sign-quantized) vector similarity: the Spark-native slot for the
reference dense indexes' b1 dtype + bitwise metric surface
(`/root/reference/baguetter/indices/dense/usearch.py:54-131` — the ``dtype``
constructor param feeds usearch's b1 packed-bit storage; `usearch.py:23-44`
``get_normalization_fn`` enumerates the bitwise metrics Hamming / Jaccard /
Tanimoto / Sorensen and maps each engine distance to a score).  The same
pair of quantizers backs the reference's embedding-side precisions
(`utils/model_helpers.py:52` ``precision: float32|int8|uint8|binary|
ubinary``): ``binary``/``ubinary`` are this module's sign packing (signed
vs unsigned storage of identical bit patterns — popcount metrics are
storage-sign-agnostic), ``int8``/``uint8`` are ``quantize_i8`` up to the
+128 offset.

Spark-first design
------------------
* **Quantize once, scan bits forever.**  ``binarize()`` packs each float
  vector into ``ceil(dim/32)`` little-endian 32-bit words stored in an
  ``array<long>`` column — a 32x size cut on the scanned data (a 1024-dim
  f32 vector becomes 128 bytes), entirely with built-in collection
  expressions inside whole-stage codegen; no UDF, no shuffle.
* **32-bit words, not 64.**  Word values stay < 2^32, so the DuckDB oracle
  can rebuild them with an exact double-precision ``sum(power(2, d%32))``
  (2^32 < 2^53) and every popcount/XOR below behaves identically under
  Spark's and DuckDB's signed-64 semantics — no sign-bit edge case.
* **Metrics are JVM popcounts.**  Each metric is a fold of
  ``bit_count(a_i OP b_i)`` over the word arrays (`F.bit_count`, codegen'd),
  against a broadcast query set — same narrow scan shape as
  ``similarity.cosine_topk``, ~32x less data per row.

Score contract (rank-identical to the reference's ascending-distance order):
every metric is returned as a **similarity in [0, 1], ranked descending**,
each a strictly decreasing function of the corresponding usearch distance:

* ``hamming``  : 1 - popcount(a XOR b) / dim   (reference reverses min-max
  over (0, dim) the same way, usearch.py:37-38)
* ``jaccard``  : |a AND b| / |a OR b|          (1 - jaccard_distance)
* ``tanimoto`` : |a AND b| / (|a| + |b| - |a AND b|) — equals jaccard on
  bitsets; kept as a distinct registry name for reference API parity, and
  because its usearch distance (-log2 of this ratio) is a monotone transform
  with the SAME ranking.
* ``sorensen`` : 2|a AND B| / (|a| + |b|)      (1 - sorensen_distance)

Empty-bitset edge: 0/0 ratios (both vectors all-zero after quantization) are
NULL under ``try_divide`` and dropped before ranking — mirroring dense.py's
zero-norm cosine handling.

The module also carries the reference's OTHER quantized dtype, **i8 scalar
quantization** (usearch ``dtype="i8"``): each vector is scaled by
``127 / max(|v_d|)`` and rounded half-away-from-zero to int8 — a 4x scan cut
over f32 with integer dot products.  Spark's ``F.round`` (Java HALF_UP =
half away from zero on doubles) and DuckDB's ``round()`` agree, and the
scale factor is computed with the identical expression shape on both sides,
so the quantized codes — and therefore the integer similarity math — are
bit-reproducible by the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from baguetter_spark.operators.search import per_query_topk

WORD_BITS = 32

BINARY_METRICS = ("hamming", "jaccard", "tanimoto", "sorensen")


def pack_bits(vec: Column, dim: int) -> Column:
    """Sign-quantize ``vec`` (array<float/double>, length ``dim``) into
    ``ceil(dim/32)`` packed words: bit (d % 32) of word (d // 32) is set iff
    ``vec[d] > 0`` — the standard sign binarization (matches what usearch's
    b1 cast does to a float embedding).  Pure codegen expressions.
    """
    n_words = (dim + WORD_BITS - 1) // WORD_BITS

    def word(w: Column) -> Column:
        # slice may run short on the tail word; zip_with null-pads and the
        # when() below sends null lanes to 0
        lanes = F.zip_with(
            F.slice(vec, w * WORD_BITS + 1, WORD_BITS),
            F.sequence(F.lit(0), F.lit(WORD_BITS - 1)),
            # 2^j via pow (exact in double for j < 32; F.shiftleft needs a
            # Python-int shift, which a lambda position j is not)
            lambda x, j: F.when(
                x > 0, F.pow(F.lit(2.0), j).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(
            lanes, F.lit(0).cast("long"), lambda acc, b: acc + F.coalesce(b, F.lit(0).cast("long"))
        )

    return F.transform(F.sequence(F.lit(0), F.lit(n_words - 1)), word)


def binarize(
    embeddings: DataFrame,
    dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_col: str = "bits",
) -> DataFrame:
    """(id, vector) -> (id, bits: array<long>) sign-quantized index table."""
    return embeddings.select(
        F.col(id_col), pack_bits(F.col(vec_col), dim).alias(bits_col)
    )


def _popcount(words: Column) -> Column:
    return F.aggregate(
        F.transform(words, lambda w: F.bit_count(w).cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def _pop_zip(a: Column, b: Column, op) -> Column:
    return _popcount(F.zip_with(a, b, op))


def binary_score(a: Column, b: Column, metric: str, dim: int) -> Column:
    """Similarity column for two packed-bit arrays (see module contract)."""
    if metric == "hamming":
        ham = _pop_zip(a, b, lambda x, y: x.bitwiseXOR(y))
        return F.lit(1.0) - ham / F.lit(float(dim))
    inter = _pop_zip(a, b, lambda x, y: x.bitwiseAND(y))
    if metric == "jaccard":
        return F.try_divide(inter, _pop_zip(a, b, lambda x, y: x.bitwiseOR(y)))
    pa, pb = _popcount(a), _popcount(b)
    if metric == "tanimoto":
        return F.try_divide(inter, pa + pb - inter)
    if metric == "sorensen":
        return F.try_divide(F.lit(2) * inter, pa + pb)
    msg = f"unsupported binary metric {metric!r}; choose from {BINARY_METRICS}"
    raise ValueError(msg)


def quantize_i8(vec: Column) -> Column:
    """Per-vector i8 scalar quantization (reference usearch i8 dtype):
    ``round(v_d * 127 / max(|v|))`` half-away-from-zero, int8-ranged codes
    stored as array<int> (int avoids Spark/Arrow tinyint-overflow foot-guns
    in downstream integer dot products).  An all-zero vector maps to
    all-zero codes (try_divide NULL -> 0)."""
    max_abs = F.array_max(F.transform(vec, F.abs))
    return F.transform(
        vec,
        lambda x: F.coalesce(
            F.round(F.try_divide(x * F.lit(127.0), max_abs), 0), F.lit(0.0)
        ).cast("int"),
    )


def i8_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize to i8 codes then exact cosine top-k in INTEGER dot-product
    space (the reference's i8 search path: distances computed over the
    quantized codes, usearch.py:54-131 dtype param).

    (query_id, rank, vec_id, sim_r): 6-dp-rounded cosine of the code
    vectors, vec_id tie-break, self-matches excluded.  Zero-norm code
    vectors yield NULL under try_divide and are dropped.
    """
    codes = embeddings.select(
        F.col(id_col), quantize_i8(F.col(vec_col)).alias("codes")
    )
    q = codes.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("qcodes")
    )
    joined = codes.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("qcodes"), lambda x, y: (x * y).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )

    def sqnorm(c: Column) -> Column:
        return F.aggregate(
            F.transform(c, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )

    sim = F.try_divide(
        dot, F.sqrt(sqnorm(F.col("codes"))) * F.sqrt(sqnorm(F.col("qcodes")))
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("sim_r"),
    ).where(F.col("sim_r").isNotNull() & ~F.isnan(F.col("sim_r")))
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="sim_r")
    return topped.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "sim_r"
    )


def binary_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    metric: str = "hamming",
    k: int = 5,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-quantize then exact binary-metric top-k of every vector vs the
    given query vectors (reference b1-dtype dense search,
    usearch.py:232-326, with the ascending-distance order expressed as
    descending similarity — see module contract).

    (query_id, rank, vec_id, sim_r): rank on the 6-dp-rounded similarity
    with vec_id tie-break; self-matches excluded.  Plan shape: one packed
    scan x broadcast packed queries — no shuffle until the two-phase top-k.
    """
    if metric not in BINARY_METRICS:
        msg = f"unsupported binary metric {metric!r}; choose from {BINARY_METRICS}"
        raise ValueError(msg)
    bits = binarize(embeddings, dim, id_col=id_col, vec_col=vec_col)
    q = bits.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("bits").alias("qbits")
    )
    joined = bits.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("query_id"))
    sim = binary_score(F.col("bits"), F.col("qbits"), metric, dim)
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("sim_r"),
    ).where(F.col("sim_r").isNotNull())
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="sim_r")
    return topped.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "sim_r"
    )

"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side ``zip_with``/``aggregate`` dot products
  against a broadcast query set — the exact baseline;
- banded-LSH ANN: deterministic random-hyperplane sign buckets (integer
  pseudo-noise planes so the DuckDB oracle reproduces them exactly),
  OR-amplified across ``n_bands`` bands of ``n_planes`` planes each —
  candidates = union over bands of same-bucket matches, then exact cosine.

Scale notes: brute force is O(Q x N) — fine for small Q with a broadcast
query matrix; at 10^9+ vectors the LSH variant turns it into per-bucket
joins.  Banding controls recall: P(candidate) = 1 - (1 - p^r)^b with
p = 1 - theta/pi per plane, so more bands raise recall (OR-amplification)
while more planes per band sharpen precision (fewer candidates per bucket).
Both final rankings run through the two-phase ``per_query_topk`` (no
full-partition window — hot-query straggler defense at 10^9 vectors).
The reference's dense indexes (usearch/faiss HNSW,
`baguetter/indices/dense/usearch.py:47-417`) are native ANN libraries; this
is the Spark-native equivalent slot (MultiIndex-compatible by producing the
same results shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baguetter_spark.operators.search import per_query_topk

# Deterministic integer pseudo-noise hyperplanes: plane p, dim d has weight
# ((A[p]*d + B[p]) % 97) - 48 in [-48, 48].  MAX_PLANES bounds the global
# plane table; bands slice it as planes [band*n_planes, (band+1)*n_planes).
MAX_PLANES = 64
PLANE_A = [3 * p + 1 for p in range(MAX_PLANES)]
PLANE_B = [7 * p + 3 for p in range(MAX_PLANES)]
PLANE_MOD = 97
PLANE_SHIFT = 48

# Defaults for the gate/fixture scale: 8 bands x 4 planes -> for a pair at
# cosine ~0.8 (theta ~0.64 rad, p ~0.8) P(candidate) = 1-(1-0.8^4)^8 ~ 0.98.
N_BANDS = 8
N_PLANES_PER_BAND = 4

# Backward-compat: the round-1 single-band bucket width.
N_PLANES = 8


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _cosine(a, b):
    """try_divide: a zero-norm vector yields NULL (not an ANSI divide error /
    NaN — NaN sorts ABOVE every real score in Spark's descending window, so
    it must never reach ranking); callers drop NULL/NaN scores."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _round_away6(a):
    """6-dp round-half-away-from-zero on the SCALED DOUBLE — the regime
    DuckDB's round() implements.  Used for every numpy-side rounding in the
    pretrained-IVF path (executor cell assignment AND driver probe
    selection) so all three engines rank the same rounded values; np.round
    is half-EVEN (and internally scale-inexact), a third regime that could
    flip a probe-vs-assignment tie at an exact .5 boundary."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5) / 1e6, a)


def _drop_unrankable(scored: DataFrame, score_col: str) -> DataFrame:
    return scored.where(
        F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col))
    )


def _probe_dim(embeddings: DataFrame, vec_col: str) -> int:
    first = embeddings.select(vec_col).first()
    if first is None or first[0] is None:
        msg = (
            f"cannot infer embedding dimension: input has no rows with a "
            f"non-null '{vec_col}' column (pass dim= explicitly)"
        )
        raise RuntimeError(msg)
    return len(first[0])


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
    cos = _cosine(F.col(vec_col), F.col("qvec"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cos, 6).alias("cos_r"),
    )
    scored = _drop_unrankable(scored, "cos_r")
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="cos_r")
    return topped.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cos_r"
    )


def l2sq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k (reference usearch MetricKind.L2sq — the
    default faiss/usearch metric alongside cos/ip; ascending distance).

    (query_id, rank, vec_id, l2sq_r): rank on the 6-dp-rounded squared
    distance ASCENDING with vec_id tie-break; self-matches excluded.  Ranking
    reuses the descending two-phase ``per_query_topk`` on the negated
    distance (monotone), then emits the positive distance.
    """
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    diff = F.zip_with(F.col(vec_col), F.col("qvec"), lambda x, y: x - y)
    l2sq = F.aggregate(
        F.transform(diff, lambda d: d * d), F.lit(0.0), lambda s, x: s + x
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        (-F.round(l2sq, 6)).alias("neg_dist"),
    )
    scored = _drop_unrankable(scored, "neg_dist")
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="neg_dist")
    return topped.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "vec_id",
        F.round(-F.col("neg_dist"), 6).alias("l2sq_r"),
    )


def cosine_radius(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    min_cos: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radius search (reference usearch radius mode,
    /root/reference/baguetter/indices/dense/usearch.py search-by-threshold
    surface): ALL vectors with cosine >= min_cos per query — no top-k cut.

    (query_id, vec_id, cos_r), cos_r rounded to 6 dp.  Same broadcast-query
    brute scan as cosine_topk but the selective >= predicate replaces the
    ranking window entirely — no shuffle at all after the scan."""
    q = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    )
    cos = _cosine(F.col(vec_col), F.col("qvec"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cos, 6).alias("cos_r"),
    )
    return _drop_unrankable(scored, "cos_r").where(F.col("cos_r") >= min_cos)


def lsh_bucket(vec_col, dim: int, *, band: int = 0, n_planes: int = N_PLANES):
    """Sign-bucket id over ``n_planes`` deterministic integer hyperplanes
    (band ``band`` uses global planes [band*n_planes, (band+1)*n_planes)):
    bucket = sum_r 2^r * [dot(plane, v) > 0]."""
    def _plane_term(a, b):
        return lambda x, d: x * (
            (F.lit(a) * d + F.lit(b)) % F.lit(PLANE_MOD) - F.lit(PLANE_SHIFT)
        ).cast("double")

    bucket = F.lit(0).cast("long")
    for r in range(n_planes):
        p = band * n_planes + r
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                _plane_term(PLANE_A[p], PLANE_B[p]),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << r)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_band_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    *,
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES_PER_BAND,
) -> DataFrame:
    """Explode each row into ``n_bands`` (band, bucket) rows — the banded
    signature table.  One narrow projection per band; no shuffle."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                lsh_bucket(F.col(vec_col), dim, band=b, n_planes=n_planes).alias(
                    "bucket"
                ),
            )
            for b in range(n_bands)
        ]
    )
    return df.withColumn("__bb", F.explode(bands)).select(
        "*", F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket")
    ).drop("__bb")


def ann_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES_PER_BAND,
) -> DataFrame:
    """Approximate top-k with recall control: a vector is a candidate for a
    query iff they share a bucket in ANY band (OR-amplification); exact
    cosine over the deduplicated candidate set.  Deterministic (integer
    planes); the oracle computes the identical procedure."""
    if dim is None:
        dim = _probe_dim(embeddings, vec_col)
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    emb_b = lsh_band_buckets(emb, "vec", dim, n_bands=n_bands, n_planes=n_planes)
    q_b = emb_b.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    # candidate ids: same (band, bucket) in any band, deduplicated — ids
    # only, so the shuffle/distinct never carries vectors
    cand = (
        emb_b.select("vec_id", "band", "bucket")
        .join(F.broadcast(q_b), ["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qvecs = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    joined = cand.join(emb, "vec_id").join(F.broadcast(qvecs), "query_id")
    cos = _cosine(F.col("vec"), F.col("qvec"))
    scored = joined.select("query_id", "vec_id", F.round(cos, 6).alias("cos_r"))
    scored = _drop_unrankable(scored, "cos_r")
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="cos_r")
    return topped.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cos_r"
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    *,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: int = 42,
    train_fraction: float | None = None,
    centroid_ids: list[int] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means centroids partition the
    corpus into ``n_centroids`` cells; each query probes only its ``n_probe``
    nearest cells and ranks exact cosine inside them.

    The centroid-bucketed counterpart of ``ann_lsh_topk`` (the reference's
    native dense indexes, `baguetter/indices/dense/usearch.py:47-417`, cover
    this slot with HNSW; IVF is the cell-probe family).  Clustering runs on
    L2-NORMALIZED vectors so Euclidean k-means cells equal cosine cells;
    zero-norm vectors are unrankable and drop before clustering.

    Scale shape (10^9+ vectors): fit on a driver-bounded sample
    (``train_fraction``; MLlib k-means|| on the sample), assignment is one
    broadcast-model map pass, and each query scans ~``n_probe/n_centroids``
    of the corpus — candidate generation never shuffles vectors (cell ids
    only).  Recall is governed by n_probe/n_centroids (property-tested
    recall@k >= 0.9 on the clustered fixture); results are approximate and
    k-means-seeded, NOT bit-deterministic like the integer-plane LSH —
    keep ann_lsh_topk for oracle-exact pipelines.

    ``centroid_ids`` injects PRETRAINED centroids instead of running
    k-means: the vectors of those corpus ids become the cells (cell j =
    j-th id in ascending order; ``n_centroids``/``seed``/``max_iter``/
    ``train_fraction`` are ignored).  This is the production shape for
    re-used quantizers — at 10^12 vectors centroids are trained ONCE on a
    sample and re-applied to every new partition/segment, so assignment
    must not depend on a fresh clustering run.  It is also fully
    deterministic: assignment and probe selection rank round(cosine, 6)
    with ties broken by cell id, so the whole query is reproducible in
    ANSI SQL (gate row ``ann_ivf_pretrained`` hash-checks it vs DuckDB).
    """
    import numpy as np

    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    normed = (
        emb.withColumn("vnorm", _norm(F.col("vec")))
        .where(F.col("vnorm") > 0)
        .select(
            "vec_id",
            "vec",
            F.transform("vec", lambda x: x / F.col("vnorm")).alias("uvec"),
        )
    )
    spark = embeddings.sparkSession
    if centroid_ids is not None:
        # ---- pretrained/injected centroids: no clustering, deterministic
        cells = sorted({int(i) for i in centroid_ids})
        if len(cells) != len(centroid_ids):
            msg = "centroid_ids must be distinct"
            raise ValueError(msg)
        crows = {
            r["vec_id"]: np.asarray(r["vec"], dtype=np.float64)
            for r in emb.where(F.col("vec_id").isin(cells)).collect()
        }
        missing = [i for i in cells if i not in crows]
        if missing:
            msg = f"centroid_ids not found in corpus: {missing}"
            raise ValueError(msg)
        cent_vecs = [crows[i] for i in cells]
        cent_norms = [float(np.linalg.norm(cv)) for cv in cent_vecs]
        zero = [cells[j] for j, n in enumerate(cent_norms) if not n > 0]
        if zero:
            msg = f"zero-norm centroid_ids: {zero}"
            raise ValueError(msg)
        # Centroids are driver-resident constants, so assignment is a pure
        # map-side argmax over a broadcast (k x d) matrix — zero shuffle,
        # zero row amplification.  (The previous plan crossJoined the corpus
        # with k centroid rows and pushed the k-times-amplified table
        # through a row_number window — petabytes of shuffle at the
        # docstring's 10^12-vector scale for what is an argmax over
        # constants.)  Ties at equal rounded csim go to the smallest cell
        # (np.argmax returns the first max), matching the oracle's
        # `ORDER BY csim DESC, cell ASC`.
        cmat = np.vstack(cent_vecs)
        cnorm = np.asarray(cent_norms, dtype=np.float64)
        bc_cent = spark.sparkContext.broadcast((cmat, cnorm))

        @F.pandas_udf("int")
        def assign_cell(vecs: pd.Series) -> pd.Series:
            import numpy as _np

            cm, cn = bc_cent.value
            out = _np.full(len(vecs), -1, dtype=_np.int32)
            if len(vecs) == 0:
                return pd.Series(out)
            # dimension-mismatched (ragged-ingest) vectors are unrankable:
            # assign cell -1 and drop below — the SQL plan this replaced
            # yielded NULL cosine for them and they died at the exact-cosine
            # rerank's NaN filter; crashing the matmul instead would fail
            # the whole job on one bad row
            dims = vecs.map(lambda x: -1 if x is None else len(x)).to_numpy()
            ok = dims == cm.shape[1]
            if ok.any():
                v = _np.asarray(
                    [_np.asarray(x, dtype=_np.float64) for x in vecs[ok]]
                )
                sims = _round_away6(
                    (v @ cm.T) / (_np.linalg.norm(v, axis=1)[:, None] * cn[None, :])
                )
                out[_np.flatnonzero(ok)] = _np.argmax(sims, axis=1).astype(_np.int32)
            return pd.Series(out)

        assigned = normed.select(
            "vec_id", "vec", assign_cell(F.col("vec")).alias("cell")
        ).where(F.col("cell") >= 0)
        # probe selection mirrors assignment: round(cosine, 6), ties -> cell
        qraw = {
            r["vec_id"]: np.asarray(r["vec"], dtype=np.float64)
            for r in normed.where(F.col("vec_id").isin(query_ids))
            .select("vec_id", "vec")
            .collect()
        }
        probe_rows = []
        for qid in query_ids:
            qv = qraw.get(qid)
            if qv is None:
                continue  # zero-norm / missing query vector: unrankable
            qn = float(np.linalg.norm(qv))
            sims = _round_away6(
                [float(qv @ cv) / (qn * cn) for cv, cn in zip(cent_vecs, cent_norms)]
            )
            order = sorted(range(len(cells)), key=lambda j: (-sims[j], j))
            probe_rows.extend((int(qid), int(j)) for j in order[:n_probe])
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        with_feat = normed.withColumn(
            "features", array_to_vector(F.col("uvec").cast("array<double>"))
        )
        train = (
            with_feat.sample(fraction=train_fraction, seed=seed)
            if train_fraction is not None
            else with_feat
        )
        model = KMeans(
            k=n_centroids, maxIter=max_iter, seed=seed, featuresCol="features"
        ).fit(train.select("features"))
        assigned = model.transform(with_feat).select(
            "vec_id", "vec", F.col("prediction").alias("cell")
        )

        # per-query probe cells: centroids are tiny (n_centroids x dim) and
        # the query set is small by contract -> numpy on the driver
        centers = np.vstack([c for c in model.clusterCenters()])  # unit-ish
        qrows = {
            r["vec_id"]: np.asarray(r["uvec"], dtype=np.float64)
            for r in normed.where(F.col("vec_id").isin(query_ids)).collect()
        }
        probe_rows = []
        for qid in query_ids:
            if qid not in qrows:
                continue  # zero-norm / missing query vector: unrankable
            sims = centers @ qrows[qid]
            for cell in np.argsort(-sims)[:n_probe]:
                probe_rows.append((int(qid), int(cell)))
    probe = spark.createDataFrame(probe_rows, schema="query_id long, cell int")

    qvecs = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    joined = (
        assigned.join(F.broadcast(probe), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qvecs), "query_id")
    )
    cos = _cosine(F.col("vec"), F.col("qvec"))
    scored = joined.select("query_id", "vec_id", F.round(cos, 6).alias("cos_r"))
    scored = _drop_unrankable(scored, "cos_r")
    topped = per_query_topk(scored, k, id_col="vec_id", score_col="cos_r")
    return topped.select(
        "query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cos_r"
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_BANDS,
    n_planes: int = N_PLANES_PER_BAND,
    exhaustive: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: all (id_a < id_b) with exact
    cosine >= threshold — the dense-vector member of the dedup family
    (alongside exact/n-gram/MinHash/SimHash in operators/dedup.py).

    Scale path (default): banded-LSH candidate generation — two rows are a
    candidate pair iff they share a (band, bucket) in ANY band — followed
    by exact cosine verification.  The self-join carries ids only (vectors
    never cross the distinct), the same discipline as ann_lsh_topk.
    Candidate volume is sum over bands/buckets of bucket_size^2/2, so at
    scale ``n_planes`` (bucket count 2^n_planes per band) is the knob that
    bounds bucket sizes; recall follows the banding s-curve
    1-(1-p^r)^b.  Pairs missed by the banding are missed identically by
    the DuckDB gate oracle (which mirrors the same integer planes), so the
    gate verifies the bucketed plan end-to-end; the recall-vs-exhaustive
    property is pinned separately in tests/test_dense.py.

    ``exhaustive=True`` replaces candidate generation with the full a<b
    cross-join (exact recall baseline; small scales only).

    Returns (id_a, id_b, cos_r), cos_r rounded to 6 dp.
    """
    emb = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    if exhaustive:
        a = emb.select(F.col("vec_id").alias("id_a"))
        b = emb.select(F.col("vec_id").alias("id_b"))
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            dim = _probe_dim(embeddings, vec_col)
        bb = lsh_band_buckets(
            emb, "vec", dim, n_bands=n_bands, n_planes=n_planes
        ).select("vec_id", "band", "bucket")
        cand = (
            bb.alias("a")
            .join(bb.alias("b"), ["band", "bucket"])
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
            )
            .distinct()
        )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos_r"))
    )
    return _drop_unrankable(scored, "cos_r").where(F.col("cos_r") >= threshold)

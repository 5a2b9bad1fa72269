"""Binary (sign-quantized) similarity: pack_bits + bitwise metrics vs a
numpy bit-level reference, and the DenseSparkIndex b1-metric surface
(reference dense dtype/MetricKind registry, usearch.py:23-44,54-131)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from baguetter_spark.dense import DenseSparkIndex
from baguetter_spark.operators.binary_sim import (
    BINARY_METRICS,
    binarize,
    binary_topk,
)


def _vecs(n, dim, seed=11):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float64)


def _np_pack(vecs, dim, word_bits=32):
    """Reference packing: bit (d % 32) of word (d // 32) set iff v[d] > 0."""
    n_words = (dim + word_bits - 1) // word_bits
    out = np.zeros((len(vecs), n_words), dtype=np.int64)
    for r, v in enumerate(vecs):
        for d in range(dim):
            if v[d] > 0:
                out[r, d // word_bits] |= 1 << (d % word_bits)
    return out


def _np_sims(bits, qbits, metric, dim):
    sims = []
    for row in bits:
        inter = sum(bin(a & b).count("1") for a, b in zip(row, qbits))
        union = sum(bin(a | b).count("1") for a, b in zip(row, qbits))
        pa = sum(bin(a).count("1") for a in row)
        pb = sum(bin(b).count("1") for b in qbits)
        if metric == "hamming":
            ham = sum(bin(a ^ b).count("1") for a, b in zip(row, qbits))
            sims.append(1.0 - ham / dim)
        elif metric == "jaccard":
            sims.append(inter / union if union else np.nan)
        elif metric == "tanimoto":
            den = pa + pb - inter
            sims.append(inter / den if den else np.nan)
        else:  # sorensen
            sims.append(2 * inter / (pa + pb) if pa + pb else np.nan)
    return np.array(sims)


@pytest.mark.parametrize("dim", [8, 32, 40, 64])
def test_pack_bits_matches_numpy(spark, dim):
    vecs = _vecs(6, dim)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(6), "embedding": [list(v) for v in vecs]})
    )
    got = {
        r["vec_id"]: r["bits"]
        for r in binarize(df, dim).orderBy("vec_id").collect()
    }
    want = _np_pack(vecs, dim)
    for i in range(6):
        assert got[i] == list(want[i]), f"row {i} dim {dim}"


@pytest.mark.parametrize("metric", BINARY_METRICS)
def test_binary_topk_matches_numpy(spark, metric):
    dim = 64
    vecs = _vecs(40, dim)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [list(v) for v in vecs]})
    )
    got = (
        binary_topk(df, [0, 1], metric=metric, k=5, dim=dim)
        .orderBy("query_id", "rank")
        .collect()
    )
    bits = _np_pack(vecs, dim)
    for qid in (0, 1):
        sims = np.round(_np_sims(bits, bits[qid], metric, dim), 6)
        sims[qid] = -np.inf  # self-match excluded
        order = np.lexsort((np.arange(40), -sims))[:5]
        rows = [r for r in got if r["query_id"] == qid]
        assert [r["vec_id"] for r in rows] == list(order)
        for r, i in zip(rows, order):
            assert r["sim_r"] == pytest.approx(sims[i], abs=1e-9)


def test_tanimoto_jaccard_rank_identical(spark):
    """On bitsets |A AND B|/(|A|+|B|-|A AND B|) == |A AND B|/|A OR B|: the
    two registry names must produce the same ranking AND the same values."""
    dim = 32
    vecs = _vecs(25, dim, seed=3)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(25), "embedding": [list(v) for v in vecs]})
    )
    a = binary_topk(df, [2], metric="jaccard", k=10, dim=dim).collect()
    b = binary_topk(df, [2], metric="tanimoto", k=10, dim=dim).collect()
    assert sorted((r["rank"], r["vec_id"], r["sim_r"]) for r in a) == sorted(
        (r["rank"], r["vec_id"], r["sim_r"]) for r in b
    )


def test_dense_index_hamming_and_l2sq(spark):
    dim = 16
    vecs = _vecs(20, dim, seed=5)
    keys = [f"d{i:02d}" for i in range(20)]
    ham_idx = DenseSparkIndex(spark, metric="hamming").add_many(
        keys, [list(v) for v in vecs]
    )
    got_keys, got_scores = ham_idx.search(list(vecs[4]), top_k=4)
    bits = _np_pack(vecs, dim)
    sims = _np_sims(bits, bits[4], "hamming", dim)
    order = np.lexsort((keys, -sims))[:4]
    assert got_keys == [keys[i] for i in order]
    for s, i in zip(got_scores, order):
        assert s == pytest.approx(sims[i], abs=1e-12)

    l2_idx = DenseSparkIndex(spark, metric="l2sq").add_many(
        keys, [list(v) for v in vecs]
    )
    got_keys, got_scores = l2_idx.search(list(vecs[4]), top_k=4)
    d2 = ((vecs - vecs[4]) ** 2).sum(axis=1)
    order = np.lexsort((keys, d2))[:4]
    assert got_keys == [keys[i] for i in order]
    for s, i in zip(got_scores, order):  # score = negated squared distance
        assert s == pytest.approx(-d2[i], rel=1e-12)


def test_l2sq_topk_matches_numpy(spark):
    from baguetter_spark.operators.similarity import l2sq_topk

    dim = 24
    vecs = _vecs(30, dim, seed=9)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(30), "embedding": [list(v) for v in vecs]})
    )
    got = l2sq_topk(df, [7], k=6).orderBy("rank").collect()
    d2 = np.round(((vecs - vecs[7]) ** 2).sum(axis=1), 6)
    d2[7] = np.inf
    order = np.lexsort((np.arange(30), d2))[:6]
    assert [r["vec_id"] for r in got] == list(order)
    for r, i in zip(got, order):
        assert r["l2sq_r"] == pytest.approx(d2[i], abs=1e-9)


def test_quantize_i8_matches_numpy(spark):
    from baguetter_spark.operators.binary_sim import quantize_i8

    vecs = _vecs(8, 12, seed=21)
    vecs[3] = 0.0  # all-zero vector -> all-zero codes
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(8), "embedding": [list(v) for v in vecs]})
    )
    got = {
        r["vec_id"]: r["c"]
        for r in df.select("vec_id", quantize_i8(F.col("embedding")).alias("c")).collect()
    }
    for i, v in enumerate(vecs):
        ma = np.abs(v).max()
        if ma == 0:
            want = [0] * len(v)
        else:
            # numpy rounds half-to-even; emulate Java/DuckDB half-away-from-zero
            want = [int(np.floor(abs(x) * 127.0 / ma + 0.5)) * (1 if x >= 0 else -1) for x in v]
        assert got[i] == want, f"row {i}"
        assert all(-127 <= c <= 127 for c in got[i])


def test_i8_cosine_topk_matches_numpy(spark):
    from baguetter_spark.operators.binary_sim import i8_cosine_topk

    dim = 32
    vecs = _vecs(35, dim, seed=17)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(35), "embedding": [list(v) for v in vecs]})
    )
    got = i8_cosine_topk(df, [5], k=6).orderBy("rank").collect()
    codes = np.zeros((35, dim))
    for i, v in enumerate(vecs):
        ma = np.abs(v).max()
        codes[i] = [
            int(np.floor(abs(x) * 127.0 / ma + 0.5)) * (1 if x >= 0 else -1) for x in v
        ]
    sims = np.round(
        (codes @ codes[5])
        / (np.sqrt((codes**2).sum(axis=1)) * np.sqrt((codes[5] ** 2).sum())),
        6,
    )
    sims[5] = -np.inf
    order = np.lexsort((np.arange(35), -sims))[:6]
    assert [r["vec_id"] for r in got] == list(order)
    for r, i in zip(got, order):
        assert r["sim_r"] == pytest.approx(sims[i], abs=1e-9)


def test_binary_metric_registry_guards(spark):
    with pytest.raises(ValueError, match="unsupported metric"):
        DenseSparkIndex(spark, metric="euclidean")
    with pytest.raises(ValueError, match="use_lsh"):
        DenseSparkIndex(spark, metric="hamming", use_lsh=True)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[1.0, -1.0]]})
    )
    with pytest.raises(ValueError, match="unsupported binary metric"):
        binary_topk(df, [0], metric="cosine", k=1, dim=2)


def test_dense_radius_param_reference_semantics(spark):
    """`search(..., radius=r)` keeps only docs within distance r (reference
    usearch radius mode), in each metric's own distance domain."""
    dim = 16
    vecs = _vecs(25, dim, seed=31)
    keys = [f"d{i:02d}" for i in range(25)]
    q = vecs[9]

    cos_idx = DenseSparkIndex(spark, metric="cosine").add_many(
        keys, [list(v) for v in vecs]
    )
    got, scores = cos_idx.search(list(q), top_k=25, radius=0.7)
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = {keys[i] for i in range(25) if 1.0 - sims[i] <= 0.7}
    assert set(got) == want
    assert all(s >= 0.3 - 1e-12 for s in scores)

    l2_idx = DenseSparkIndex(spark, metric="l2sq").add_many(
        keys, [list(v) for v in vecs]
    )
    d2 = ((vecs - q) ** 2).sum(axis=1)
    r = float(np.median(d2))
    got, _ = l2_idx.search(list(q), top_k=25, radius=r)
    assert set(got) == {keys[i] for i in range(25) if d2[i] <= r}

    # ip: usearch's ip kernel measures d = 1 - <a,b> (NOT -dot), so
    # radius=r keeps dot >= 1 - r
    ip_idx = DenseSparkIndex(spark, metric="ip").add_many(
        keys, [list(v) for v in vecs]
    )
    dots = vecs @ q
    r_ip = float(1.0 - np.median(dots))
    got, _ = ip_idx.search(list(q), top_k=25, radius=r_ip)
    assert set(got) == {keys[i] for i in range(25) if 1.0 - dots[i] <= r_ip}

    ham_idx = DenseSparkIndex(spark, metric="hamming").add_many(
        keys, [list(v) for v in vecs]
    )
    bits = _np_pack(vecs, dim)
    ham = np.array(
        [sum(bin(a ^ b).count("1") for a, b in zip(row, bits[9])) for row in bits]
    )
    got, _ = ham_idx.search(list(q), top_k=25, radius=5.0)
    assert set(got) == {keys[i] for i in range(25) if ham[i] <= 5}


def test_exact_search_per_call_override(spark):
    """Reference usearch.py:232-240: exact_search=None uses the index
    default, True forces the brute scan (LSH index answers == brute),
    False demands an angular metric."""
    dim = 12
    vecs = _vecs(20, dim, seed=13)
    keys = [f"d{i:02d}" for i in range(20)]
    lsh_idx = DenseSparkIndex(spark, metric="cosine", use_lsh=True).add_many(
        keys, [list(v) for v in vecs]
    )
    brute_idx = DenseSparkIndex(spark, metric="cosine").add_many(
        keys, [list(v) for v in vecs]
    )
    got_exact = lsh_idx.search(list(vecs[2]), top_k=5, exact_search=True)
    want = brute_idx.search(list(vecs[2]), top_k=5)
    assert got_exact == want
    ham_idx = DenseSparkIndex(spark, metric="hamming").add_many(
        keys, [list(v) for v in vecs]
    )
    with pytest.raises(ValueError, match="exact_search=False"):
        ham_idx.search(list(vecs[2]), top_k=5, exact_search=False)


def test_all_zero_vector_unrankable_for_ratio_metrics(spark):
    """A vector that quantizes to the empty bitset has NULL jaccard/sorensen
    vs another empty bitset (0/0) — dropped, never ranked above real docs."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1, 2],
                "embedding": [[-1.0, -1.0], [-1.0, -1.0], [1.0, -1.0]],
            }
        )
    )
    rows = binary_topk(df, [0], metric="jaccard", k=3, dim=2).collect()
    # doc 1 (empty AND empty -> 0/0) must be absent; doc 2 has jaccard 0/...
    assert all(r["vec_id"] != 1 for r in rows)

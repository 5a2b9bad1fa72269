"""Driver-gate queries, part 2: BMX search + evaluation metrics.

Same determinism rules as gate.py (whitespace-lower tokenization, float64
index mode, 4-dp rounded re-rank, numeric doc ids).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baguetter_spark.config import SparseIndexConfig
from baguetter_spark.gate import (
    GATE_PREPROCESSOR,
    GATE_QUERIES,
    TOP_K,
    _ALL,
    _gate_query_df,
    _numeric_doc_id,
    _rounded_topk,
    _SQL_DOCS,
    _sql_values_queries,
    documents_as_transcripts,
    gate_index,
)
from baguetter_spark.operators.bmx import BMXIndex, bmx_score_queries, build_bmx_index
from baguetter_spark.operators.search import score_queries

_BMX_CACHE: dict[tuple, BMXIndex] = {}


def gate_bmx_index(spark: SparkSession, sf_dir: str) -> BMXIndex:
    key = (sf_dir, spark.sparkContext.applicationId)
    if key not in _BMX_CACHE:
        cfg = SparseIndexConfig(dtype="float64", preprocessor=GATE_PREPROCESSOR)
        _BMX_CACHE[key] = build_bmx_index(
            spark, documents_as_transcripts(spark, sf_dir), cfg
        )
    return _BMX_CACHE[key]


def bmx_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = gate_bmx_index(spark, sf_dir)
    res = bmx_score_queries(index, _gate_query_df(spark), top_k=_ALL, parity=False)
    return _rounded_topk(res)


# BMX float64 SQL (reference index.py:105-148 with exact f64 stats):
#   alpha = clamp(avgdl/100, 0.5, 1.5); beta = 1/ln(1+N)
#   entropy(term) = -sum over postings of p*ln(p), p = sigmoid(tf)
#   per query: ent_max over in-vocab token occurrences; avg_ent = avg(ent/ent_max)
#   score(q,d) = sum over matched occurrences of
#       idf*(tf*(a+1))/(tf + a*rel_len + a*avg_ent) + (m/qlen)*(ent/ent_max)*beta
BMX_TOPK_SQL = f"""
WITH {_SQL_DOCS},
{_sql_values_queries()},
ent AS (
  SELECT term, -sum(p * ln(p)) AS entropy
  FROM (SELECT term, 1.0 / (1.0 + exp(-CAST(tf AS DOUBLE))) AS p FROM tf)
  GROUP BY term
),
idf AS (
  SELECT d.term, ln(1 + ((s.n_docs - d.df) + 0.5) / (d.df + 0.5)) AS idf
  FROM dfreq d CROSS JOIN stats s
),
rel AS (SELECT dl.doc_id, CAST(dl.dlen AS DOUBLE) / s.avgdl AS rel_len FROM dl CROSS JOIN stats s),
qtok AS (
  SELECT query_id,
         unnest(list_filter(regexp_split_to_array(lower(qtext), '\\s+'), t -> t <> '')) AS term
  FROM queries
),
qocc AS (SELECT query_id, term FROM qtok WHERE term IN (SELECT term FROM dfreq)),
qstat1 AS (
  SELECT q.query_id, max(e.entropy) AS ent_max, count(*) AS qlen
  FROM qocc q JOIN ent e USING (term) GROUP BY q.query_id
),
qstat AS (
  SELECT q1.query_id, q1.ent_max, q1.qlen, avg(e.entropy / q1.ent_max) AS avg_ent
  FROM qocc q JOIN ent e USING (term) JOIN qstat1 q1 ON q1.query_id = q.query_id
  GROUP BY q1.query_id, q1.ent_max, q1.qlen
),
qterm AS (SELECT query_id, term, count(*) AS mult FROM qocc GROUP BY query_id, term),
matched AS (
  SELECT q.query_id, tf.doc_id, q.term, q.mult, tf.tf
  FROM qterm q JOIN tf ON tf.term = q.term
),
msum AS (SELECT query_id, doc_id, sum(mult) AS m FROM matched GROUP BY query_id, doc_id),
scored AS (
  SELECT mt.query_id, mt.doc_id,
         sum(mt.mult * (
           i.idf * ((mt.tf * (greatest(least(1.5, s.avgdl / 100), 0.5) + 1.0))
             / (mt.tf + greatest(least(1.5, s.avgdl / 100), 0.5) * r.rel_len
                     + greatest(least(1.5, s.avgdl / 100), 0.5) * qs.avg_ent))
           + (CAST(ms.m AS DOUBLE) / qs.qlen) * (e.entropy / qs.ent_max)
             * (1.0 / ln(1 + s.n_docs))
         )) AS score
  FROM matched mt
  JOIN idf i ON i.term = mt.term
  JOIN ent e ON e.term = mt.term
  JOIN rel r ON r.doc_id = mt.doc_id
  JOIN msum ms ON ms.query_id = mt.query_id AND ms.doc_id = mt.doc_id
  JOIN qstat qs ON qs.query_id = mt.query_id
  CROSS JOIN stats s
  GROUP BY mt.query_id, mt.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(score, 4) AS score_r,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def eval_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation metrics as a gate query: score the BM25 f64 run against
    deterministic qrels (relevance = # distinct query terms a doc contains,
    kept where >= 2) with the vendored Spark-native metric aggregations."""
    from baguetter_spark.evaluation import per_query_metrics

    index = gate_index(spark, sf_dir, "lucene")
    res = score_queries(index, _gate_query_df(spark), top_k=_ALL, parity=False)
    # numeric doc_id so tie ordering matches the SQL side's numeric sort
    run = _rounded_topk(res, k=TOP_K).select(
        "query_id", "doc_id", F.col("score_r").alias("score")
    )

    # qrels: per (query, doc) count of distinct query terms present in doc
    qdf = _gate_query_df(spark)
    from baguetter_spark.gate import load_documents

    docs = load_documents(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    doc_terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != "")
            )
        ).alias("term"),
    )
    q_terms = qdf.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != "")
            )
        ).alias("term"),
    )
    qrels = (
        q_terms.join(doc_terms, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("relevance"))
        .where(F.col("relevance") >= 2)
    )

    metrics = ["ndcg@10", "precision@10", "recall@10", "mrr@10", "map@10"]
    pq = per_query_metrics(run, qrels, metrics)
    return pq.select(
        "query_id",
        *[F.round(F.col(m), 6).alias(m.replace("@", "_")) for m in metrics],
    )


EVAL_METRICS_SQL = f"""
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
         sum(q.mult * (ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)))
                    * (tf.tf / (1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl) + tf.tf))) AS score
  FROM qterm q
  JOIN dfreq d USING (term)
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
run AS (
  SELECT query_id, doc_id, round(score, 4) AS score,
         row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id ASC) AS rank
  FROM scored
  QUALIFY rank <= {TOP_K}
),
qrels AS (
  SELECT q.query_id, t.doc_id, count(DISTINCT q.term) AS relevance
  FROM (SELECT DISTINCT query_id, term FROM qtok) q
  JOIN (SELECT DISTINCT doc_id, term FROM toks) t USING (term)
  GROUP BY q.query_id, t.doc_id
  HAVING count(DISTINCT q.term) >= 2
),
joined AS (
  SELECT r.query_id, r.rank, coalesce(qr.relevance, 0) AS rel
  FROM run r LEFT JOIN qrels qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
),
cum AS (
  SELECT query_id, rank, rel,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY rank) AS hits_cum
  FROM joined
),
ideal AS (
  SELECT query_id, relevance,
         row_number() OVER (PARTITION BY query_id ORDER BY relevance DESC, doc_id ASC) AS irank
  FROM qrels
),
idcg AS (
  SELECT query_id, sum(relevance / log2(irank + 1)) AS idcg10
  FROM ideal WHERE irank <= 10 GROUP BY query_id
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY query_id),
perq AS (
  SELECT query_id,
         sum(rel / log2(rank + 1)) AS dcg10,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / 10.0 AS p10,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits10,
         1.0 / min(CASE WHEN rel > 0 THEN rank END) AS rr10,
         sum(CASE WHEN rel > 0 THEN CAST(hits_cum AS DOUBLE) / rank END) AS apsum10
  FROM cum GROUP BY query_id
),
assembled AS (
  SELECT n.query_id,
         coalesce(p.dcg10 / i.idcg10, 0.0) AS ndcg,
         coalesce(p.p10, 0.0) AS p,
         coalesce(CAST(p.hits10 AS DOUBLE) / n.n_rel, 0.0) AS rec,
         coalesce(p.rr10, 0.0) AS mrr,
         coalesce(p.apsum10 / n.n_rel, 0.0) AS ap
  FROM nrel n
  LEFT JOIN perq p USING (query_id)
  LEFT JOIN idcg i USING (query_id)
)
SELECT query_id,
       round(ndcg, 6) AS ndcg_10,
       round(p, 6) AS precision_10,
       round(rec, 6) AS recall_10,
       round(mrr, 6) AS mrr_10,
       round(ap, 6) AS map_10
FROM assembled
"""


def gate2_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bmx_topk": bmx_topk_query,
        "eval_metrics": eval_metrics_query,
    }


def gate2_oracle_sql() -> dict[str, str]:
    return {
        "bmx_topk": BMX_TOPK_SQL,
        "eval_metrics": EVAL_METRICS_SQL,
    }

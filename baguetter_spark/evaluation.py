"""Evaluation harness: the Spark counterpart of `baguetter/evaluation/`.

Mirrors the reference flow (`evaluation/eval.py:246-359`): per dataset,
build each retriever (timed "index_time"), run the query batch (timed
"search_time"), drop self-hits (``ignore_identical_ids``,
eval.py:349-353), then score runs against qrels.  The reference delegates
metrics to `ranx` (unavailable offline); metrics here are **vendored as
DataFrame aggregations** — at 10^6 evaluation queries the metric
computation itself is a distributed job, not a driver loop.

Metric semantics (ranx-compatible):
- ``ndcg@k``: Jarvelin DCG = Σ_{i<=k} rel_i / log2(i + 1) over the
  run ranking, normalized by the ideal DCG of the query's qrels (ranx's
  default ``ndcg``);
- ``precision@k`` = |relevant ∩ top-k| / k;
- ``recall@k`` = |relevant ∩ top-k| / |relevant|;
- ``mrr@k`` = 1 / rank of the first relevant hit (0 if none in top-k);
- ``map@k`` = mean over relevant hit ranks of precision@rank.
Queries present in qrels but missing from a run score 0 (ranx
``make_comparable`` keeps the qrels query set fixed across runs).

Ranking rule: rows are re-ranked by (score desc, doc_id asc) per query —
the canonical tie order used across this engine (SURVEY §4.2.6).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

METRIC_NAMES = ("ndcg", "precision", "recall", "mrr", "map")


def create_metrics(metrics: list[str], steps: list[int]) -> list[str]:
    """Mirror of `evaluation/eval.py:19-30`."""
    return [f"{metric}@{step}" for metric in metrics for step in steps]


def _parse_metric(m: str) -> tuple[str, int]:
    name, _, k = m.partition("@")
    if name not in METRIC_NAMES:
        msg = f"unknown metric {name!r}; supported: {METRIC_NAMES}"
        raise ValueError(msg)
    return name, int(k or 10)


def per_query_metrics(
    run: DataFrame,
    qrels: DataFrame,
    metrics: list[str],
) -> DataFrame:
    """run(query_id, doc_id, score) x qrels(query_id, doc_id, relevance)
    -> (query_id, <one column per metric>).

    One shuffle on query_id; every metric is a conditional aggregation over
    the ranked join — no driver-side loops, scales to any query count.
    """
    parsed = [_parse_metric(m) for m in metrics]
    max_k = max(k for _, k in parsed)

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ranked = (
        run.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max_k)
        .join(qrels.withColumnRenamed("relevance", "rel"), ["query_id", "doc_id"], "left")
        .fillna(0, subset=["rel"])
    )

    # ideal ranking of the qrels (for ndcg denominators)
    wi = Window.partitionBy("query_id").orderBy(F.col("relevance").desc(), F.col("doc_id").asc())
    ideal = (
        qrels.where(F.col("relevance") > 0)
        .withColumn("irank", F.row_number().over(wi))
        .where(F.col("irank") <= max_k)
    )

    # per-query scalars from qrels: total relevant, idcg@k per distinct k
    idcg_aggs = [
        F.sum(
            F.when(F.col("irank") <= k, F.col("relevance") / F.log2(F.col("irank") + 1))
        ).alias(f"idcg_{k}")
        for k in sorted({k for name, k in parsed if name == "ndcg"})
    ]
    qrel_stats = ideal.groupBy("query_id").agg(
        F.count("*").alias("n_rel_capped"), *idcg_aggs
    )
    n_rel = (
        qrels.where(F.col("relevance") > 0)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_rel"))
    )

    # per-(query, rank) precision for map@k: hits up to rank / rank
    wcum = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = ranked.withColumn(
        "hits_cum", F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(wcum)
    )

    aggs = []
    for name, k in parsed:
        in_k = F.col("rank") <= k
        hit = (F.col("rel") > 0) & in_k
        if name == "ndcg":
            aggs.append(
                F.sum(F.when(in_k, F.col("rel") / F.log2(F.col("rank") + 1))).alias(
                    f"dcg_{k}"
                )
            )
        elif name == "precision":
            aggs.append((F.sum(F.when(hit, 1).otherwise(0)) / k).alias(f"precision@{k}"))
        elif name == "recall":
            aggs.append(F.sum(F.when(hit, 1).otherwise(0)).alias(f"hits_{k}"))
        elif name == "mrr":
            aggs.append((1.0 / F.min(F.when(hit, F.col("rank")))).alias(f"rr_{k}"))
        elif name == "map":
            aggs.append(
                F.sum(F.when(hit, F.col("hits_cum") / F.col("rank"))).alias(f"apsum_{k}")
            )
    per_q = ranked.groupBy("query_id").agg(*aggs)

    # assemble final per-query metric columns (qrels query set is the frame)
    out = (
        n_rel.join(qrel_stats, "query_id", "left")
        .join(per_q, "query_id", "left")
    )
    cols = [F.col("query_id")]
    for name, k in parsed:
        if name == "ndcg":
            c = F.coalesce(F.col(f"dcg_{k}") / F.col(f"idcg_{k}"), F.lit(0.0))
        elif name == "precision":
            c = F.coalesce(F.col(f"precision@{k}"), F.lit(0.0))
        elif name == "recall":
            c = F.coalesce(F.col(f"hits_{k}") / F.col("n_rel"), F.lit(0.0))
        elif name == "mrr":
            c = F.coalesce(F.col(f"rr_{k}"), F.lit(0.0))
        else:  # map (trec_eval convention: AP@k = Σ P@hit_rank / |relevant|)
            c = F.coalesce(F.col(f"apsum_{k}") / F.col("n_rel"), F.lit(0.0))
        cols.append(c.alias(f"{name}@{k}"))
    return out.select(*cols)


def score_run(run: DataFrame, qrels: DataFrame, metrics: list[str]) -> dict[str, float]:
    """Mean of each metric over the qrels query set (driver-side scalars)."""
    pq = per_query_metrics(run, qrels, metrics)
    row = pq.agg(*[F.avg(m).alias(m) for m in metrics]).collect()[0]
    return {m: float(row[m] or 0.0) for m in metrics}


@dataclasses.dataclass
class SparkDataset:
    """Evaluation dataset backed by DataFrames (the reference's `HFDataset`
    shape, `evaluation/datasets/hf_dataset.py:40-90`, without the network)."""

    name: str
    corpus: DataFrame  # doc_id, text
    queries: DataFrame  # query_id, text
    qrels: DataFrame  # query_id, doc_id, relevance

    @classmethod
    def from_parquet(cls, spark: SparkSession, name: str, base: str) -> SparkDataset:
        return cls(
            name=name,
            corpus=spark.read.parquet(f"{base}/corpus.parquet"),
            queries=spark.read.parquet(f"{base}/queries.parquet"),
            qrels=spark.read.parquet(f"{base}/qrels.parquet"),
        )


@dataclasses.dataclass
class EvalResult:
    """Per-dataset result (reference `EvalResult`, eval.py:52-100)."""

    report: dict[str, dict[str, float]]  # retriever -> metric -> value
    timings: dict[str, dict[str, float]]  # retriever -> {index_time, search_time}

    def save(self, result_dir: str) -> None:
        """Persist report + timings as JSON (reference eval.py:69-100 writes
        report.json/timings.json; the xlsx/csv exports need openpyxl, which
        the report JSON supersedes)."""
        import json
        import os

        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "report.json"), "w") as f:
            json.dump(self.report, f, indent=2, sort_keys=True)
        with open(os.path.join(result_dir, "timings.json"), "w") as f:
            json.dump(self.timings, f, indent=2, sort_keys=True)


@dataclasses.dataclass
class EvalResults:
    results: dict[str, EvalResult] = dataclasses.field(default_factory=dict)

    def add(self, dataset_name: str, result: EvalResult) -> None:
        self.results[dataset_name] = result

    def save(self, result_dir: str) -> None:
        """One subdirectory per dataset (reference eval.py:103-140)."""
        import os

        for name, res in self.results.items():
            res.save(os.path.join(result_dir, name))


def evaluate_retrievers(
    datasets: list[SparkDataset],
    retriever_factories: dict[str, Callable[[], object]],
    *,
    metrics: list[str] | None = None,
    top_k: int = 100,
    ignore_identical_ids: bool = True,
) -> EvalResults:
    """Mirror of `evaluate_retrievers` (eval.py:246-304).

    Retrievers are engine facades (BM25SparkIndex / BMXSparkIndex / anything
    with ``build(transcripts_df)`` + ``score_queries(queries_df, top_k=)``).
    """
    metrics = metrics or create_metrics(["ndcg", "precision", "mrr"], [1, 5, 10])
    results = EvalResults()
    for ds in datasets:
        # corpora with a title column index "title text" (reference
        # HFDataset.get_corpus concat, hf_dataset.py:40-90)
        text_col = (
            F.concat_ws(" ", F.col("title"), F.col("text"))
            if "title" in ds.corpus.columns
            else F.col("text")
        )
        transcripts = ds.corpus.select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            text_col.alias("text"),
        )
        report: dict[str, dict[str, float]] = {}
        timings: dict[str, dict[str, float]] = {}
        for name, factory in retriever_factories.items():
            retriever = factory()
            t0 = time.time()
            retriever.build(transcripts)
            index_time = time.time() - t0

            t0 = time.time()
            res = retriever.score_queries(ds.queries, top_k=top_k)
            # doc_id comes back as conv_id:turn_idx; strip the synthetic turn
            run = res.select(
                "query_id",
                F.regexp_replace("doc_id", ":0$", "").alias("doc_id"),
                "score",
            )
            if ignore_identical_ids:
                run = run.where(F.col("doc_id") != F.col("query_id"))
            run = run.persist()
            run.count()  # materialize inside the timed window (search cost)
            search_time = time.time() - t0

            report[name] = score_run(run, ds.qrels, metrics)
            timings[name] = {"index_time": index_time, "search_time": search_time}
            run.unpersist()
        results.add(ds.name, EvalResult(report=report, timings=timings))
    return results

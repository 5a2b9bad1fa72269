"""Rank fusion (hybrid merge) as DataFrame aggregations.

Re-expresses the reference `Fuser` (`baguetter/fuser/fuser.py`) over a runs
DataFrame ``(query_id, run, doc_id, score)``.  Reference semantics kept:

- pre-step: min-max normalize any non-normalized run per (query, run)
  (fuser.py:158-163; ``max(max-min, 1e-9)`` denominator, numpy_utils.py:27-43);
- rank within a run = position in the descending result list; the reference
  enumerates the already-sorted SearchResults (0-based for RRF/weighted-RRF/
  Borda, 1-based for ISR/median — fuser.py:22-132).  We canonicalize the
  within-run order to (score desc, doc_id asc);
- post-step: sort desc, truncate top_k, then min-max re-normalize with fixed
  bounds (0, n_runs) — i.e. fused/n_runs (fuser.py:165-178);
- default algorithm = reciprocal_rank (fuser/config.py:8-16).  NOTE the
  reference's RRF divides by (rank + normalized SCORE), not the usual
  constant 60 (fuser.py:31).

All nine algorithms (F1-F9) are pure groupBy aggregations after a per-run
window rank — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALGORITHMS = (
    "reciprocal_rank",
    "weighted",
    "weighted_reciprocal_rank",
    "comb_sum",
    "comb_mnz",
    "borda_count",
    "z_score",
    "isr",
    "median_rank",
)


def _prepare(runs: DataFrame, normalized: bool) -> DataFrame:
    """Add 0-based within-run rank, run size n, and min-max-normalized score."""
    w_run = Window.partitionBy("query_id", "run")
    w_rank = w_run.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    out = runs.withColumn("rank0", F.row_number().over(w_rank) - F.lit(1))
    out = out.withColumn("n_run", F.count("*").over(w_run))
    if normalized:
        return out.withColumn("nscore", F.col("score").cast("double"))
    mn = F.min("score").over(w_run)
    mx = F.max("score").over(w_run)
    return out.withColumn(
        "nscore",
        (F.col("score") - mn) / F.greatest(mx - mn, F.lit(1e-9)),
    )


def fuse(
    runs: DataFrame,
    algorithm: str = "reciprocal_rank",
    *,
    weights: dict[str, float] | None = None,
    top_k: int = 100,
    normalized: bool = False,
) -> DataFrame:
    """Fuse runs(query_id, run, doc_id, score) -> (query_id, rank, doc_id, score).

    ``weights`` maps run name -> weight (reference passes a list aligned with
    run order; a dict is the DataFrame-native equivalent).
    """
    if algorithm not in ALGORITHMS:
        msg = f"unknown fusion algorithm {algorithm!r}; choose from {ALGORITHMS}"
        raise ValueError(msg)

    prepared = _prepare(runs, normalized)

    if weights:
        mapping = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        prepared = prepared.withColumn(
            "w", F.coalesce(mapping[F.col("run")], F.lit(1.0))
        )
    else:
        prepared = prepared.withColumn("w", F.lit(1.0))

    g = prepared.groupBy("query_id", "doc_id")
    if algorithm == "reciprocal_rank":
        fused = g.agg(F.sum(1.0 / (F.col("rank0") + F.col("nscore"))).alias("fscore"))
    elif algorithm == "weighted":
        fused = g.agg(F.sum(F.col("w") * F.col("nscore")).alias("fscore"))
    elif algorithm == "weighted_reciprocal_rank":
        fused = g.agg(
            F.sum(F.col("w") / (F.col("rank0") + F.col("nscore"))).alias("fscore")
        )
    elif algorithm == "comb_sum":
        fused = g.agg(F.sum("nscore").alias("fscore"))
    elif algorithm == "comb_mnz":
        fused = g.agg((F.sum("nscore") * F.count("*")).alias("fscore"))
    elif algorithm == "borda_count":
        fused = g.agg(F.sum(F.col("n_run") - F.col("rank0")).cast("double").alias("fscore"))
    elif algorithm == "z_score":
        w_run = Window.partitionBy("query_id", "run")
        z = prepared.withColumn(
            "z",
            (F.col("nscore") - F.avg("nscore").over(w_run))
            / F.stddev_pop("nscore").over(w_run),
        )
        fused = z.groupBy("query_id", "doc_id").agg(F.sum("z").alias("fscore"))
    elif algorithm == "isr":
        fused = g.agg(
            F.sum(1.0 / F.pow(F.col("rank0") + F.lit(1), F.lit(2))).alias("fscore")
        )
    else:  # median_rank
        fused = g.agg(F.median(F.col("rank0") + F.lit(1)).alias("fscore"))

    # count runs once per (query) for the fixed-bounds renormalization
    n_runs = runs.select("query_id", "run").distinct().groupBy("query_id").agg(
        F.count("*").alias("n_runs")
    )
    w_fin = Window.partitionBy("query_id").orderBy(
        F.col("fscore").desc(), F.col("doc_id").asc()
    )
    out = (
        fused.withColumn("rank", F.row_number().over(w_fin))
        .where(F.col("rank") <= top_k)
        .join(n_runs, "query_id")
        # min_max_normalization(scores, (0, n_runs)) == score / max(n_runs, 1e-9)
        .withColumn("score", F.col("fscore") / F.greatest(F.col("n_runs"), F.lit(1e-9)))
        .select("query_id", "rank", "doc_id", "score")
    )
    return out

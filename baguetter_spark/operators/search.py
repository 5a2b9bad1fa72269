"""Batch top-k search: broadcast query scatter over posting blocks + gather.

Re-expresses the reference query path (`baguetter/indices/sparse/base.py:
417-536`, numba kernel `models/bm25/index.py:150-185`, top-k
`utils/numpy_utils.py:46-73`) as ONE Spark job for a whole query batch
(the reference's `search_many` thread pool becomes partition parallelism):

    queries -> tokenize (same UDF as docs) -> posexplode (tok order kept)
            -> vocab join (OOV silently dropped; duplicates kept)   [Q2]
            -> broadcast-join onto posting blocks on term_id        [scatter]
            -> decode blocks, per-batch partial aggregation         [Q3]
            -> groupBy(query_id, doc_idx) final sum                 [gather]
            -> per-query window top-k (score desc, doc_idx asc)     [Q4]
            -> doc_map join -> doc_id                               [Q5]
            [-> query-count normalization]                          [Q6]

Two scoring modes:
- ``parity=True`` (default): float32 accumulation in query-token order —
  bit-identical scores to the reference kernel (scores[d] += impact * w is
  order-sensitive in float32; SURVEY §4.2.2).  Contributions are gathered
  per (query, doc) and folded in token order inside a pandas UDF.
- ``parity=False``: JVM-side double-precision ``F.sum`` — the fast path for
  100 TB serving, mathematically equal within 1e-7 relative.

Tie handling: the reference's argpartition tie order is nondeterministic, so
we define the canonical total order (score desc, doc_idx asc) — SURVEY §4.2.6.

Empty/fully-OOV queries: by default they return 0 rows; with
``empty_query="reference"`` every query is padded to exactly k rows with
zero-score docs, matching the reference's always-k contract
(index.py:176-185 + utils/numpy_utils.py:63-73 — its pad docs are
argpartition-arbitrary; ours are the deterministic lowest doc ids).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from baguetter_spark.compress import decode_doc_ids, decode_impacts
from baguetter_spark.config import SparseIndexConfig
from baguetter_spark.functions.preprocess import tokens_udf
from baguetter_spark.operators.indexer import BM25Index


def per_query_topk(
    scores: DataFrame,
    top_k: int,
    *,
    id_col: str = "doc_idx",
    score_col: str = "score",
) -> DataFrame:
    """(query_id, <id_col>, <score_col>) -> rows with rank <= top_k per
    query, canonical tie order (score desc, id asc).

    Two-phase: a partition-local top-k first, then the global window.  The
    naive `row_number() OVER (PARTITION BY query_id)` funnels EVERY candidate
    of a query through one task — a hot-term query over 10^12 docs has ~10^10
    candidates, which is a guaranteed straggler/OOM at scale.  The local
    phase bounds the window's input to k rows per (query, partition); it is
    rank-safe because any global top-k row is also in its own partition's
    top-k under the same total order.  The local pruner folds ALL Arrow
    batches of a partition into one bounded accumulator (k rows per query at
    any time) so the per-(query, partition) bound holds regardless of how
    many batches the partition yields.

    NaN scores are DROPPED up front: the two phases would otherwise disagree
    (pandas sorts NaN last, Spark's descending window ranks NaN first), making
    results partition-dependent.  BM25/BMX scores are never NaN; the dense/ANN
    callers filter NaN themselves, so this is a belt-and-braces contract.
    """
    scores = scores.where(~F.isnan(F.col(score_col).cast("double")))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            merged = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            merged = merged.sort_values(
                ["query_id", score_col, id_col], ascending=[True, False, True]
            )
            acc = merged.groupby("query_id", sort=False).head(top_k)
        if acc is not None:
            yield acc

    pruned = scores.mapInPandas(local_topk, schema=scores.schema)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return pruned.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= top_k
    )


def tokenize_queries(index: BM25Index, queries: DataFrame) -> DataFrame:
    """queries(query_id, text[, weight]) -> (query_id, tok_pos, term_id, weight,
    n_tokens).  n_tokens counts IN-VOCAB tokens (reference normalizes by
    len(token_ids) post-OOV-drop, base.py:438)."""
    tokenize = tokens_udf(index.config.preprocessor)
    has_weight = "weight" in queries.columns
    has_part = "part" in queries.columns
    q = queries.withColumn("toks", tokenize(F.col("text")))
    q = q.select(
        "query_id",
        F.posexplode("toks").alias("tok_pos", "term"),
        *([F.col("weight")] if has_weight else [F.lit(None).cast("double").alias("weight")]),
        *([F.col("part")] if has_part else []),
    )
    if has_part:
        # search_weighted concatenates sub-queries (base.py:516-520): global
        # token order = (sub-query order, token order).  2^20 tokens/part cap.
        q = q.withColumn(
            "tok_pos", (F.col("part").cast("long") * (1 << 20) + F.col("tok_pos")).cast("int")
        ).drop("part")
    # OOV dropped by the inner join; duplicates kept (one row per position).
    q = q.join(index.vocab.select("term", "term_id"), "term").drop("term")
    # in-vocab token count per query (for normalization)
    counts = q.groupBy("query_id").agg(F.count("*").alias("n_tokens"))
    return q.join(counts, "query_id")


def score_queries(
    index: BM25Index,
    queries: DataFrame,
    *,
    top_k: int = 100,
    parity: bool = True,
    normalize: bool | None = None,
    pruned: bool | str = False,
    empty_query: str = "empty",
    probe_blocks: int = 2,
) -> DataFrame:
    """Returns results(query_id, rank, doc_id, score) — canonical tie order.

    ``pruned=True`` routes through the rank-safe block-max MaxScore kernel
    (wand.py) instead of exhaustive scoring; implies ``parity=False`` score
    arithmetic (float64) but identical doc sets/ranks (property-tested).

    ``pruned="blockmax"`` additionally skips ENTIRE doc-range blocks whose
    query upper bound (sum over query terms of weight * per-block max
    impact, metadata written at index time) cannot reach the running top-k
    threshold: phase A scores the ``probe_blocks`` most-promising blocks per
    query exactly (doc ranges partition docs, so a local candidate's score
    is its exact final score), the k-th phase-A score becomes θ, and phase B
    scores only blocks with bound >= θ (an epsilon-margin keep guards f64
    summation-order ulps; ties at θ are kept, so canonical tie order is
    preserved).  At sf-bench scale (1-2 blocks) this is pure overhead; at
    10^12 turns (~10^7 blocks) it is the block-max WAND scan-skip that makes
    selective queries sublinear in corpus size.  Rank-safe: a doc in a
    skipped block has score <= block bound < θ <= true k-th score.

    ``empty_query``: "empty" (default) returns only matched docs; "reference"
    pads every query to exactly min(top_k, n_docs) rows with zero-score docs
    (deterministic lowest doc ids), matching the reference's always-k result
    shape (index.py:176-185).
    """
    cfg = index.config
    dtype = cfg.dtype
    normalize = cfg.normalize_scores if normalize is None else normalize
    if empty_query not in ("empty", "reference"):
        msg = f"empty_query must be 'empty' or 'reference', got {empty_query!r}"
        raise ValueError(msg)
    if pruned not in (False, True, "blockmax"):
        msg = f"pruned must be False, True or 'blockmax', got {pruned!r}"
        raise ValueError(msg)
    if pruned == "blockmax" and probe_blocks < 1:
        msg = f"probe_blocks must be >= 1, got {probe_blocks}"
        raise ValueError(msg)
    if pruned and "weight" in queries.columns:
        # Rank-safety guard: MaxScore's suffix bound assumes every term's
        # contribution is bounded ABOVE by its max impact, which a negative
        # weight inverts (a candidate's partial score can DECREASE later, so
        # θ is no longer a valid cutoff).  Fall back to exhaustive scoring.
        # The check is one scalar agg over the (tiny) query table.
        min_w = queries.agg(F.min("weight")).collect()[0][0]
        if min_w is not None and float(min_w) < 0.0:
            pruned = False
    if pruned:
        parity = False

    qterms = tokenize_queries(index, queries)
    # Weighted search concatenates sub-queries: global token positions must
    # follow the caller's order; weight cast to float32 (base.py:524).
    qterms = qterms.select(
        "query_id",
        "tok_pos",
        "term_id",
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("float").alias("weight"),
        "n_tokens",
    )

    # --- scatter: broadcast the (small) query-term table to posting blocks ---
    # Pushdown: materialize the (small) set of queried term ids and FILTER the
    # posting scan with it.  On a saved index (parquet range-partitioned +
    # sorted by term_id, io.save_index) this turns into row-group min/max
    # pruning — at 100 TB only the queried terms' blocks are read instead of
    # the whole posting table (the broadcast join alone would scan all of it).
    # Collecting the id set costs one extra Spark job (tokenize + vocab join),
    # so it runs only when the posting table actually hits storage — for an
    # in-memory (persisted) index the filter saves nothing and the job is
    # pure per-batch latency.
    postings = index.postings
    if not postings.storageLevel.useMemory:
        qterm_ids = [r["term_id"] for r in qterms.select("term_id").distinct().collect()]
        if len(qterm_ids) <= 10_000:  # keep the isin literal sane for huge batches
            postings = postings.where(F.col("term_id").isin(qterm_ids))
    joined = postings.join(
        F.broadcast(qterms), "term_id"
    ).select(
        "query_id", "block_id", "tok_pos", "weight", "n_postings",
        "doc_ids_delta", "impacts_f32",
    )

    if pruned:
        # Doc ranges partition documents, so a doc's FULL score lives inside
        # one (query_id, block_id) group: run the MaxScore kernel per group
        # (bounded memory, parallel across ranges), emit exact-scored local
        # top-k candidates, take the global top-k of the union.
        from baguetter_spark.operators.wand import maxscore_topk

        dt = dtype
        k = top_k

        def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            qid = pdf["query_id"].iloc[0]
            weights = pdf["weight"].to_numpy(dtype=np.float64)
            doc_arrays = [
                decode_doc_ids(buf, int(n))
                for buf, n in zip(pdf["doc_ids_delta"], pdf["n_postings"])
            ]
            impact_arrays = [decode_impacts(buf, dt) for buf in pdf["impacts_f32"]]
            ids, sc = maxscore_topk(weights, doc_arrays, impact_arrays, k)
            return pd.DataFrame(
                {"query_id": np.full(len(ids), qid, dtype=object), "doc_idx": ids, "score": sc}
            )

        topk_schema = "query_id string, doc_idx long, score double"
        if pruned == "blockmax":
            # --- phase 0: per-(query, block) upper bounds from block_max
            # metadata.  Narrow projection — parquet column pruning keeps the
            # posting payload (doc_ids_delta/impacts) out of this scan.
            ub = (
                postings.join(F.broadcast(qterms), "term_id")
                .select(
                    "query_id",
                    "block_id",
                    (
                        F.col("weight").cast("double")
                        * F.col("block_max").cast("double")
                    ).alias("ubc"),
                )
                .groupBy("query_id", "block_id")
                .agg(F.sum("ubc").alias("ub"))
            )
            wb = Window.partitionBy("query_id").orderBy(
                F.desc("ub"), F.col("block_id").asc()
            )
            ub = ub.withColumn("brank", F.row_number().over(wb))
            # --- phase A: exact top-k inside the most-promising blocks ---
            probe = ub.where(F.col("brank") <= probe_blocks).select(
                "query_id", "block_id"
            )
            cand_a = (
                joined.join(F.broadcast(probe), ["query_id", "block_id"])
                .groupBy("query_id", "block_id")
                .applyInPandas(local_topk, schema=topk_schema)
            )
            # tiny (<= queries * probe_blocks * k rows); reused for θ + union.
            # No explicit unpersist: the caller consumes the returned plan
            # later, and Spark's ContextCleaner unpersists the (bounded)
            # block once the DataFrame goes out of driver scope.
            cand_a = cand_a.persist()
            wk = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.col("doc_idx").asc()
            )
            theta = (
                cand_a.withColumn("r", F.row_number().over(wk))
                .where(F.col("r") == top_k)
                .select("query_id", F.col("score").alias("theta"))
            )
            # --- phase B: only blocks whose bound can still matter.  The
            # epsilon keep-margin covers f64 summation-order ulps (ub and the
            # kernel sum contributions in different orders); scores are >= 0
            # here (negative weights fell back to exhaustive above).
            keep = (
                ub.where(F.col("brank") > probe_blocks)
                .join(theta, "query_id", "left")
                .where(
                    F.col("theta").isNull()
                    | (F.col("ub") >= F.col("theta") * (1.0 - 1e-9) - 1e-12)
                )
                .select("query_id", "block_id")
            )
            cand_b = (
                joined.join(keep, ["query_id", "block_id"])
                .groupBy("query_id", "block_id")
                .applyInPandas(local_topk, schema=topk_schema)
            )
            # doc ranges partition docs → a doc appears in exactly one block;
            # the union is duplicate-free by construction
            scores = cand_a.unionByName(cand_b)
        else:
            scores = joined.groupBy("query_id", "block_id").applyInPandas(
                local_topk, schema=topk_schema
            )
    elif parity:
        if dtype != "float32":
            msg = "parity mode requires dtype='float32' (the reference's default)"
            raise ValueError(msg)
        contrib_schema = "query_id string, doc_idx long, tok_pos int, contrib float"

        def decode_contribs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                qids, docs, poss, contribs = [], [], [], []
                for qid, pos, w, n, ids_buf, imp_buf in zip(
                    pdf["query_id"], pdf["tok_pos"], pdf["weight"], pdf["n_postings"],
                    pdf["doc_ids_delta"], pdf["impacts_f32"],
                ):
                    ids = decode_doc_ids(ids_buf, n)
                    imp = decode_impacts(imp_buf)  # f32 (guarded above)
                    if w != 1.0:
                        # reference: data * token_weight in float32 (index.py:184)
                        imp = imp * np.float32(w)
                    qids.append(np.full(n, qid, dtype=object))
                    docs.append(ids)
                    poss.append(np.full(n, pos, dtype=np.int32))
                    contribs.append(imp)
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qids),
                        "doc_idx": np.concatenate(docs),
                        "tok_pos": np.concatenate(poss),
                        "contrib": np.concatenate(contribs),
                    }
                )

        contribs = joined.mapInPandas(decode_contribs, schema=contrib_schema)

        # gather: fold contributions per (query, doc) in token order, float32
        gathered = contribs.groupBy("query_id", "doc_idx").agg(
            F.sort_array(F.collect_list(F.struct("tok_pos", "contrib"))).alias(
                "contrib_list"
            )
        )

        @F.pandas_udf("float")
        def fold_f32(cl: pd.Series) -> pd.Series:
            out = np.empty(len(cl), dtype=np.float32)
            for i, lst in enumerate(cl):
                acc = np.float32(0.0)
                for item in lst:
                    acc = np.float32(acc + np.float32(item["contrib"]))
                out[i] = acc
            return pd.Series(out)

        scores = gathered.select(
            "query_id", "doc_idx", fold_f32("contrib_list").alias("score")
        )
    else:
        # fast path: per-batch local aggregation in numpy, then JVM double sum
        partial_schema = "query_id string, doc_idx long, partial double"

        def decode_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                acc: dict[str, dict] = {}
                qids, docs, contribs = [], [], []
                for qid, w, n, ids_buf, imp_buf in zip(
                    pdf["query_id"], pdf["weight"], pdf["n_postings"],
                    pdf["doc_ids_delta"], pdf["impacts_f32"],
                ):
                    ids = decode_doc_ids(ids_buf, n)
                    imp = decode_impacts(imp_buf, dtype).astype(np.float64)
                    if w != 1.0:
                        imp = imp * float(w)
                    qids.append(np.full(n, qid, dtype=object))
                    docs.append(ids)
                    contribs.append(imp)
                pout = pd.DataFrame(
                    {
                        "query_id": np.concatenate(qids),
                        "doc_idx": np.concatenate(docs),
                        "partial": np.concatenate(contribs),
                    }
                )
                # local combine: shrinks shuffle volume for duplicate terms
                yield pout.groupby(["query_id", "doc_idx"], as_index=False, sort=False)[
                    "partial"
                ].sum()

        partials = joined.mapInPandas(decode_partials, schema=partial_schema)
        score_col = F.sum("partial")
        if dtype == "float32":
            score_col = score_col.cast("float")
        scores = partials.groupBy("query_id", "doc_idx").agg(score_col.alias("score"))

    # --- per-query top-k (canonical tie order) + doc_id remap --------------
    topk = per_query_topk(scores, top_k).join(
        index.doc_map.select("doc_idx", "doc_id"), "doc_idx"
    )

    if normalize:
        n_tok = qterms.select("query_id", "n_tokens").distinct()
        method = cfg.method

        is_f32 = dtype == "float32"

        @F.pandas_udf("float" if is_f32 else "double")
        def norm_udf(score_s: pd.Series, n_s: pd.Series) -> pd.Series:
            # reference bm25.py:30-53: scores(f32) / (n * fn(n)) — the float64
            # denominator is cast to f32 at the array op (numpy semantics)
            n = n_s.to_numpy(dtype=np.float64)
            if method in ("lucene", "robertson"):
                denom = n * np.log(1 + (n - 0.5) / 1.5)
            elif method == "atire":
                denom = n * np.log(n)
            elif method == "bm25l":
                denom = n * np.log((n + 1) / 1.5)
            else:  # bm25plus
                denom = n * np.log(n + 1)
            if is_f32:
                s32 = score_s.to_numpy(dtype=np.float32)
                return pd.Series(s32 / denom.astype(np.float32))
            return pd.Series(score_s.to_numpy(dtype=np.float64) / denom)

        topk = topk.join(n_tok, "query_id").withColumn(
            "score", norm_udf(F.col("score"), F.col("n_tokens"))
        )

    res = topk.select("query_id", "rank", "doc_idx", "doc_id", "score")
    if empty_query == "reference":
        res = pad_to_k(res, queries, index.doc_map, top_k, dtype)
    return res.select("query_id", "rank", "doc_id", "score")


def pad_to_k(
    res: DataFrame,
    queries: DataFrame,
    doc_map: DataFrame,
    top_k: int,
    dtype: str,
) -> DataFrame:
    """Pad every query's results to exactly min(top_k, n_docs) rows with
    zero-score docs (reference always-k contract, index.py:176-185; the
    reference's pad docs are argpartition-arbitrary — ours are the
    deterministic lowest doc ids not already in the results).

    The pad pool is the first 2*top_k docs by doc_idx: real results can
    occupy at most top_k of them, leaving >= top_k pads for any query — a
    small broadcastable constant table regardless of corpus size.
    """
    score_t = "float" if dtype == "float32" else "double"
    pool = (
        doc_map.select("doc_idx", "doc_id")
        .orderBy("doc_idx")
        .limit(2 * top_k)
    )
    pads = (
        queries.select("query_id")
        .distinct()
        .crossJoin(F.broadcast(pool))
        .join(res.select("query_id", "doc_idx"), ["query_id", "doc_idx"], "left_anti")
        .select(
            "query_id",
            "doc_idx",
            "doc_id",
            F.lit(0.0).cast(score_t).alias("score"),
        )
    )
    unioned = res.select("query_id", "doc_idx", "doc_id", "score").unionByName(pads)
    # bounded re-rank: <= 3*top_k rows per query enter the window
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_idx").asc()
    )
    return (
        unioned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_idx", "doc_id", "score")
    )


def blockmax_skip_stats(
    index: BM25Index,
    queries: DataFrame,
    *,
    top_k: int = 10,
    probe_blocks: int = 1,
) -> DataFrame:
    """Measurement companion to ``score_queries(pruned="blockmax")`` —
    round-4 VERDICT item 5 (skip-rate evidence).  Reproduces phases 0/A/θ
    with the same formulas (upper bound = sum over query terms of
    weight * block_max; θ = exact k-th score inside the probe_blocks
    most-promising blocks; keep iff ub >= θ*(1-1e-9)-1e-12) and returns
    per-query block accounting WITHOUT running phase B:

        (query_id, blocks_total, blocks_probed, blocks_kept,
         blocks_skipped, theta)

    blocks_total counts blocks containing >= 1 queried term (blocks with
    no query term never enter the scatter join in the first place — that
    is term-pushdown skipping, not θ-skipping, so it is deliberately NOT
    counted here).  blocks_skipped = total - probed - kept is the number
    of candidate-bearing blocks the θ-gate prunes; at the driver SFs with
    one 65536-doc block per corpus it is structurally 0 — the evidence
    run (scripts/blockmax_evidence.py) builds indexes at smaller
    block_doc_range to reach the multi-block regime a 10^12-doc corpus
    lives in.  Diagnostic only: the serving path in ``score_queries`` is
    untouched."""
    from baguetter_spark.operators.wand import maxscore_topk

    qterms = tokenize_queries(index, queries).select(
        "query_id",
        "term_id",
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("float").alias("weight"),
    )
    postings = index.postings
    ub = (
        postings.join(F.broadcast(qterms), "term_id")
        .select(
            "query_id",
            "block_id",
            (F.col("weight").cast("double") * F.col("block_max").cast("double")).alias("ubc"),
        )
        .groupBy("query_id", "block_id")
        .agg(F.sum("ubc").alias("ub"))
    )
    wb = Window.partitionBy("query_id").orderBy(F.desc("ub"), F.col("block_id").asc())
    ub = ub.withColumn("brank", F.row_number().over(wb)).persist()

    probe = ub.where(F.col("brank") <= probe_blocks).select("query_id", "block_id")
    joined = postings.join(F.broadcast(qterms), "term_id").select(
        "query_id", "block_id", "weight", "n_postings", "doc_ids_delta", "impacts_f32"
    )
    dt = index.config.dtype
    k = top_k

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        weights = pdf["weight"].to_numpy(dtype=np.float64)
        doc_arrays = [
            decode_doc_ids(buf, int(n))
            for buf, n in zip(pdf["doc_ids_delta"], pdf["n_postings"])
        ]
        impact_arrays = [decode_impacts(buf, dt) for buf in pdf["impacts_f32"]]
        ids, sc = maxscore_topk(weights, doc_arrays, impact_arrays, k)
        return pd.DataFrame(
            {"query_id": np.full(len(ids), qid, dtype=object), "doc_idx": ids, "score": sc}
        )

    cand_a = (
        joined.join(F.broadcast(probe), ["query_id", "block_id"])
        .groupBy("query_id", "block_id")
        .applyInPandas(local_topk, schema="query_id string, doc_idx long, score double")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_idx").asc())
    theta = (
        cand_a.withColumn("r", F.row_number().over(wk))
        .where(F.col("r") == top_k)
        .select("query_id", F.col("score").alias("theta"))
    )
    rest = ub.where(F.col("brank") > probe_blocks).join(theta, "query_id", "left")
    kept = rest.where(
        F.col("theta").isNull() | (F.col("ub") >= F.col("theta") * (1.0 - 1e-9) - 1e-12)
    )
    totals = ub.groupBy("query_id").agg(F.count("*").alias("blocks_total"))
    probed = probe.groupBy("query_id").agg(F.count("*").alias("blocks_probed"))
    n_kept = kept.groupBy("query_id").agg(F.count("*").alias("blocks_kept"))
    out = (
        totals.join(probed, "query_id", "left")
        .join(n_kept, "query_id", "left")
        .join(theta, "query_id", "left")
        .select(
            "query_id",
            "blocks_total",
            F.coalesce("blocks_probed", F.lit(0)).alias("blocks_probed"),
            F.coalesce("blocks_kept", F.lit(0)).alias("blocks_kept"),
            (
                F.col("blocks_total")
                - F.coalesce("blocks_probed", F.lit(0))
                - F.coalesce("blocks_kept", F.lit(0))
            ).alias("blocks_skipped"),
            "theta",
        )
    )
    return out

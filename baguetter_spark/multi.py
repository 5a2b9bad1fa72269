"""Hybrid retrieval: MultiIndex fan-out + SearchEngine doc-store join.

Spark counterparts of:
- `baguetter/indices/mutli.py:18-203` (`MultiIndex`): fan one query batch to
  N named sub-indices, merge per-query runs with the Fuser.  The reference's
  thread-pool fan-out becomes N Spark jobs whose result DataFrames union into
  one runs table; the fusion itself is a groupBy aggregation (operators/
  fuser.py) — one shuffle, any number of queries.
- `baguetter/indices/search_engine.py:58-220` (`SearchEngine`): an index
  plus a key-value doc store hydrating result values.  The SQLite KV store
  (`utils/sqlite_key_val.py`) becomes the docs DataFrame itself; `get_many`
  becomes a broadcast-friendly join on doc_id — no driver round-trip.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baguetter_spark.operators.fuser import fuse


class MultiSparkIndex:
    """Composite index fanning searches to named sub-engines and fusing.

    Sub-engines are any objects with ``build(transcripts)``, ``add_many``,
    ``remove_many`` and ``score_queries(queries_df, top_k=...)`` — i.e.
    BM25SparkIndex / BMXSparkIndex / another MultiSparkIndex.
    """

    def __init__(
        self,
        indices: dict[str, object] | None = None,
        *,
        algorithm: str = "reciprocal_rank",
        weights: dict[str, float] | None = None,
    ) -> None:
        # default algorithm = reciprocal_rank (reference fuser/config.py:8-16)
        self.indices: dict[str, object] = dict(indices or {})
        self.algorithm = algorithm
        self.weights = weights

    @property
    def name(self) -> str:
        return str(list(self.indices.keys()))

    def add_index(self, key: str, index: object) -> MultiSparkIndex:
        self.indices[key] = index
        return self

    def remove_index(self, key: str) -> MultiSparkIndex:
        self.indices.pop(key, None)
        return self

    # ------------------------------------------------------------------ build
    def build(self, transcripts: DataFrame) -> MultiSparkIndex:
        for idx in self.indices.values():
            idx.build(transcripts)
        return self

    def add_many(self, keys: list[str], values: list[str]) -> MultiSparkIndex:
        for idx in self.indices.values():
            idx.add_many(keys, values)
        return self

    def remove_many(self, keys: list[str]) -> MultiSparkIndex:
        for idx in self.indices.values():
            idx.remove_many(keys)
        return self

    # ----------------------------------------------------------------- search
    @property
    def synthetic_turn_suffix(self) -> bool:
        """False: score_queries already normalizes sub-run ids to user keys."""
        return False

    def score_queries(self, queries: DataFrame, *, top_k: int = 100) -> DataFrame:
        """Fan out + fuse: each sub-index scores the whole batch; the union
        of runs feeds one fusion aggregation (reference mutli.py:172-203 →
        fuser.merge).

        Doc identity across heterogeneous engines: list-API sparse engines
        emit synthetic ``key:0`` ids while dense/doc-store engines emit raw
        keys; the reference's MultiIndex feeds every sub-index the same keys
        so runs align by construction (mutli.py:105-121).  We restore that
        alignment by stripping the ``:0`` suffix ONLY from runs whose
        sub-index reports ``synthetic_turn_suffix`` (a blanket strip would
        mangle real turn-0 ids of DataFrame-built transcript corpora and
        collide them with raw keys — the ids of DataFrame-built sub-indices
        are identical across engines already)."""
        runs = None
        for name, idx in self.indices.items():
            r = idx.score_queries(queries, top_k=top_k).withColumn("run", F.lit(name))
            if getattr(idx, "synthetic_turn_suffix", False):
                r = r.withColumn("doc_id", F.regexp_replace("doc_id", ":0$", ""))
            runs = r if runs is None else runs.unionByName(r)
        if runs is None:
            msg = "MultiSparkIndex has no sub-indices"
            raise ValueError(msg)
        return fuse(
            runs.select("query_id", "run", "doc_id", "score"),
            self.algorithm,
            weights=self.weights,
            top_k=top_k,
        )

    def search_many(self, queries: list[str], *, top_k: int = 100):
        if not self.indices:
            msg = "MultiSparkIndex has no sub-indices"
            raise ValueError(msg)
        spark = next(iter(self.indices.values())).spark
        qdf = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [f"q{i}" for i in range(len(queries))], "text": queries}
            )
        )
        res = self.score_queries(qdf, top_k=top_k).collect()
        by_q: dict[str, list] = {f"q{i}": [] for i in range(len(queries))}
        for r in res:
            by_q[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
        out = []
        for i in range(len(queries)):
            entries = sorted(by_q[f"q{i}"])
            # doc_ids are already normalized per-run in score_queries
            out.append(([d for _, d, _ in entries], [s for _, _, s in entries]))
        return out

    def search(self, query: str, *, top_k: int = 100):
        return self.search_many([query], top_k=top_k)[0]


class SparkSearchEngine:
    """Index + document store: results hydrated with the stored values.

    The reference pairs the index with a SQLite pickle KV table and calls
    ``store.get_many(keys)`` per query (search_engine.py:169-176); here the
    store is the corpus DataFrame and hydration is a join — executed once
    for the whole query batch.  ``post_process_fn`` mirrors the reference's
    reranker hook (search_engine.py:54,178-180): a driver-side callable over
    the collected batch, or None.

    ``reranker`` is the DISTRIBUTED version of that hook: a pair scorer
    (``operators/rerank.PairScorer`` — e.g. ``cross_encoder_scorer(model)``
    or ``token_overlap_scorer``) applied to the hydrated candidates inside
    ``score_queries``, so reranking runs where the candidates live instead
    of on the collected driver batch.  ``rerank_top_k`` optionally cuts
    the list after rescoring (default: keep ``top_k``).
    """

    def __init__(
        self,
        index: object,
        *,
        name: str = "new-search-engine",
        post_process_fn: Callable | None = None,
        reranker: Callable | None = None,
        rerank_top_k: int | None = None,
    ) -> None:
        self.index = index
        self._name = name
        self.post_process_fn = post_process_fn
        self.reranker = reranker
        if rerank_top_k is not None and rerank_top_k <= 0:
            msg = f"rerank_top_k must be positive, got {rerank_top_k}"
            raise ValueError(msg)
        self.rerank_top_k = rerank_top_k
        self.store: DataFrame | None = None  # doc_id, value

    @property
    def name(self) -> str:
        return self._name

    def _spark(self) -> SparkSession:
        spark = getattr(self.index, "spark", None)
        if spark is None and isinstance(self.index, MultiSparkIndex):
            spark = next(iter(self.index.indices.values())).spark
        return spark

    def build(self, transcripts: DataFrame) -> SparkSearchEngine:
        self.index.build(transcripts)
        self.store = transcripts.select(
            F.concat_ws(
                ":", F.col("conv_id"), F.col("turn_idx").cast("string")
            ).alias("doc_id"),
            F.col("text").alias("value"),
        ).persist()
        return self

    def add_many(self, keys: list[str], values: list[str]) -> SparkSearchEngine:
        self.index.add_many(keys, values)
        spark = self._spark()
        # store keys must match the ids the index EMITS: list-API sparse
        # engines emit synthetic ``key:0``; Multi/dense engines emit raw keys
        suffix = ":0" if getattr(self.index, "synthetic_turn_suffix", False) else ""
        new = spark.createDataFrame(
            pd.DataFrame({"doc_id": [f"{k}{suffix}" for k in keys], "value": values})
        )
        self.store = (
            new
            if self.store is None
            else self.store.join(new.select("doc_id"), "doc_id", "left_anti").unionByName(new)
        )
        return self

    def remove_many(self, keys: list[str]) -> SparkSearchEngine:
        self.index.remove_many(keys)
        if self.store is not None:
            gone = {f"{k}:0" for k in keys} | set(keys)
            self.store = self.store.where(~F.col("doc_id").isin(list(gone)))
        return self

    def score_queries(
        self, queries: DataFrame, *, top_k: int = 100, **search_kwargs
    ) -> DataFrame:
        """-> (query_id, rank, doc_id, score, value): one hydration join for
        the whole batch (the reference's per-query get_many, S8).  With a
        ``reranker``, scores/ranks are the reranker's (the retriever acts as
        candidate generation, reference search_engine.py:178-180).  Extra
        kwargs pass through to the index and are index-specific (e.g.
        parity/pruned for BM25SparkIndex; MultiSparkIndex takes none)."""
        res = self.index.score_queries(queries, top_k=top_k, **search_kwargs)
        # Hydration at scale: res is tiny (queries x top_k) but the store is
        # the corpus.  A direct left join would hash-shuffle the WHOLE store
        # on doc_id; instead a broadcast semi-join prefilter scans the store
        # once (no exchange) and only the <= queries x top_k surviving rows
        # enter the outer join (AQE then broadcasts them).  The res subtree
        # feeds both branches through the same reused exchange.  Guarded:
        # an unbounded top_k (score-everything calls) would force-broadcast
        # an id set proportional to the corpus — there the ordinary shuffle
        # join is the correct plan.
        if top_k <= 100_000:
            ids = res.select("doc_id").distinct()
            store_side = self.store.join(F.broadcast(ids), "doc_id", "left_semi")
        else:
            store_side = self.store
        hydrated = res.join(store_side, "doc_id", "left").select(
            "query_id", "rank", "doc_id", "score", "value"
        )
        if self.reranker is None:
            return hydrated
        from baguetter_spark.operators.rerank import rerank_topk

        cands = hydrated.join(
            queries.select("query_id", F.col("text").alias("query_text")),
            "query_id",
        ).withColumn("doc_text", F.coalesce(F.col("value"), F.lit("")))
        # value survives rerank_topk on its own (score_pairs keeps every
        # input column); keep_doc_text=False drops the derived doc_text /
        # query_text copies BEFORE the top-k shuffle — text shuffles once
        out = rerank_topk(
            cands,
            self.reranker,
            top_k=top_k if self.rerank_top_k is None else self.rerank_top_k,
            id_col="doc_id",
            keep_doc_text=False,
        )
        return out.select(
            "query_id",
            "rank",
            "doc_id",
            F.col("rerank_score").alias("score"),
            "value",
        )

    def search_many(self, queries: list[str], *, top_k: int = 100):
        spark = self._spark()
        qdf = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [f"q{i}" for i in range(len(queries))], "text": queries}
            )
        )
        rows = self.score_queries(qdf, top_k=top_k).collect()
        by_q: dict[str, list] = {f"q{i}": [] for i in range(len(queries))}
        for r in rows:
            by_q[r["query_id"]].append((r["rank"], r["doc_id"], r["score"], r["value"]))
        strip = getattr(self.index, "synthetic_turn_suffix", False)
        out = []
        for i, q in enumerate(queries):
            entries = sorted(by_q[f"q{i}"])
            result = {
                "query": q,
                "keys": [
                    d[:-2] if strip and d.endswith(":0") else d
                    for _, d, _, _ in entries
                ],
                "scores": [s for _, _, s, _ in entries],
                "values": [v for _, _, _, v in entries],
            }
            out.append(result)
        if self.post_process_fn is not None:
            out = self.post_process_fn(out)
        return out

    def search(self, query: str, *, top_k: int = 100):
        return self.search_many([query], top_k=top_k)[0]

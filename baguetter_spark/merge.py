"""Distributed segment maintenance: merge and remove without re-tokenizing.

The reference rebuilds the whole index on every add/remove
(`baguetter/indices/sparse/base.py:244-256,372-398`).  At 10^12-turn scale
we keep that SEMANTIC (global df/avg_doc_len/N and sorted-rank vocabulary
are recomputed over the union / the survivors) while skipping the expensive
part: segments store raw term frequencies in their posting blocks, so both
operations work on decoded (term, doc_idx, tf) rows.

merge_indexes:

1. offsets each segment's doc ids by the cumulative doc count of the
   segments before it (segment order == insertion order),
2. decodes (term, doc_idx, tf) from the blocks (no re-tokenization),
3. unions the flats + doc maps, recomputes global stats, re-derives the
   vocabulary (term ids change — they are sorted ranks over the union),
4. recomputes impacts and reassembles blocks.

remove_docs: filters the decoded flats + doc map to the surviving docs,
compacts doc_idx (rank among survivors — insertion order is preserved, so
this equals the rebuild's assignment), and runs the same tail; terms whose
last posting died leave the vocabulary and every term id re-ranks.

Both results are bit-identical to a from-scratch build of the
concatenated / filtered corpus (differential-tested), because impacts are
pure functions of (tf, doc_len, df, N, avg_doc_len).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baguetter_spark.config import SparseIndexConfig
from baguetter_spark.operators.indexer import (
    BM25Index,
    assemble_posting_blocks,
    build_vocab,
    corpus_stats,
    impacts_flat,
    term_hash_udf,
)


def release_index(index) -> None:
    """Unpersist an index's cached frames (the three public tables plus the
    internal ``caches`` pins collected by build_index/_reindex_flat).

    DataFrame ``persist()`` entries live in Spark's CacheManager, which is
    keyed by logical plan and holds strong references — unlike RDD blocks
    they are NEVER garbage-collected.  Any code that REPLACES an index
    (chained add_transcripts / remove rounds) must release the superseded
    one, or executor storage grows by a full index copy per round until
    eviction thrash.  Only call once nothing downstream will re-read the
    frames (i.e. after the successor's checkpoint has materialized).

    Accepts any index shape with doc_map/vocab/postings DataFrames —
    BM25Index and BMXIndex (which has no ``caches`` field) both qualify."""
    if index is None:
        return
    for df in (index.doc_map, index.vocab, index.postings, *getattr(index, "caches", ())):
        try:
            df.unpersist(blocking=False)
        except Exception:  # pragma: no cover - already released / plan gone
            pass


def truncate_lineage(index: BM25Index) -> BM25Index:
    """Cut the logical plan under the three index tables (eager
    ``localCheckpoint``) after a maintenance op.

    merge_indexes / remove_docs build their outputs ON TOP of the previous
    index's plans; a loop of incremental adds therefore stacks
    decode+union+join subtrees geometrically until even rendering the
    explain string OOMs the driver (observed at ~3 chained maintenance
    ops on a toy corpus).  ``persist()`` caches data but keeps the plan;
    checkpointing replaces the plan with the materialized blocks, so each
    maintenance round starts from a flat scan — the same reason iterative
    algorithms (GraphX, ALS) checkpoint every N steps.

    ``localCheckpoint`` stores blocks on executors (lost if an executor
    dies); for durable production batches prefer ``io.save_index`` /
    ``load_index`` between rounds — a parquet checkpoint with the same
    lineage-cutting effect plus fault tolerance.
    """
    out = BM25Index(
        doc_map=index.doc_map.localCheckpoint(eager=True),
        vocab=index.vocab.localCheckpoint(eager=True),
        postings=index.postings.localCheckpoint(eager=True),
        n_docs=index.n_docs,
        avg_doc_len=index.avg_doc_len,
        total_postings=index.total_postings,
        config=index.config,
        # checkpointed RDD blocks are ContextCleaner-managed (freed when the
        # plan is GC'd), so the new index carries no explicit pins
    )
    # the eager checkpoints above have materialized: the input's pinned
    # frames (CacheManager entries, never GC'd) are now garbage — free them
    release_index(index)
    return out


def flat_postings(index: BM25Index) -> DataFrame:
    """Decode posting blocks back to (term, doc_idx, tf) rows (term STRINGS,
    since term ids are segment-local sorted ranks)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from baguetter_spark.compress import decode_doc_ids, decode_tfs

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms, docs, tfs = [], [], []
            for tid, n, ids_buf, tf_buf in zip(
                pdf["term_id"], pdf["n_postings"], pdf["doc_ids_delta"], pdf["tfs"]
            ):
                terms.append(np.full(n, tid, dtype=np.int64))
                docs.append(decode_doc_ids(ids_buf, n))
                tfs.append(decode_tfs(tf_buf, n))
            yield pd.DataFrame(
                {
                    "term_id": np.concatenate(terms),
                    "doc_idx": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                }
            )

    flat = index.postings.mapInPandas(
        decode, schema="term_id long, doc_idx long, tf long"
    )
    return flat.join(index.vocab.select("term_id", "term"), "term_id").select(
        "term", "doc_idx", "tf"
    )


def merge_indexes(
    spark: SparkSession,
    segments: list[BM25Index],
    config: SparseIndexConfig | None = None,
) -> BM25Index:
    """Merge immutable segments into one index (doc_ids must be disjoint)."""
    config = config or segments[0].config

    offset = 0
    doc_maps, flats = [], []
    for seg in segments:
        doc_maps.append(
            seg.doc_map.select(
                (F.col("doc_idx") + F.lit(offset)).alias("doc_idx"),
                "doc_id",
                "doc_len",
            )
        )
        flats.append(
            flat_postings(seg).select(
                "term", (F.col("doc_idx") + F.lit(offset)).alias("doc_idx"), "tf"
            )
        )
        offset += seg.n_docs

    doc_map = doc_maps[0]
    for dm in doc_maps[1:]:
        doc_map = doc_map.unionByName(dm)

    flat_tf = flats[0]
    for fl in flats[1:]:
        flat_tf = flat_tf.unionByName(fl)

    return _reindex_flat(doc_map, flat_tf, config)


def _reindex_flat(
    doc_map: DataFrame, flat_tf: DataFrame, config: SparseIndexConfig
) -> BM25Index:
    """Shared maintenance tail: (doc_map, flat (term, doc_idx, tf)) ->
    full index under freshly recomputed global stats — the exact stages a
    from-scratch build runs after tokenization."""
    doc_map = doc_map.persist()
    n_docs, avg_doc_len = corpus_stats(doc_map)

    # re-derive the 8-byte term keys from the decoded strings (segments may
    # predate hashed vocab columns); string witnesses stay fully populated
    # here — maintenance decode is already string-bound, not the hot build
    # path
    tf = (
        flat_tf.join(doc_map.select("doc_idx", "doc_len"), "doc_idx")
        .select("doc_idx", "doc_len", "term", "tf")
        .withColumn("term_hash", term_hash_udf()(F.col("term")))
    )
    pins: list = []
    vocab = build_vocab(tf, n_docs, avg_doc_len, config, cleanup=pins).cache()
    flat = impacts_flat(tf, vocab, n_docs, avg_doc_len, config)
    postings = assemble_posting_blocks(flat, config).persist()
    total_postings = int(vocab.agg(F.sum("df").alias("s")).collect()[0]["s"] or 0)

    return BM25Index(
        doc_map=doc_map,
        vocab=vocab,
        postings=postings,
        n_docs=n_docs,
        avg_doc_len=avg_doc_len,
        total_postings=total_postings,
        config=config,
        caches=tuple(pins),
    )


def remove_docs(
    spark: SparkSession,
    index: BM25Index,
    keys: list[str],
    config: SparseIndexConfig | None = None,
) -> BM25Index:
    """Remove documents by key WITHOUT re-tokenizing the surviving corpus:
    bit-identical to rebuilding on the filtered corpus (the reference's
    remove/remove_many semantics, base.py:372-398 — pop + full
    `_update_index`), but the only work is a posting-block filter pass plus
    the stats/vocab/impacts recompute the rebuild would run anyway.

    Unknown keys are ignored (the reference pops with ``pop(key, None)``);
    removing every document raises (an empty index has no stats — build
    fresh instead).  doc_idx compacts to the survivor rank, which equals
    the rebuild's assignment because insertion order is preserved; terms
    whose last posting died leave the vocabulary, so term ids re-rank.

    Scale shape: the removed id set rides a broadcast (the list-of-keys
    API bounds it driver-side by construction; ~8 bytes per removed doc),
    survivors never shuffle for the filter itself — the only shuffles are
    the same vocab/posting-assembly shuffles a rebuild would pay, minus
    tokenization and the raw-text scan entirely.
    """
    config = config or index.config
    removed_rows = (
        index.doc_map.where(F.col("doc_id").isin(list(keys)))
        .select("doc_idx")
        .collect()
    )
    if not removed_rows:
        return index
    removed_idx = np.array(sorted(r["doc_idx"] for r in removed_rows), dtype=np.int64)
    if removed_idx.size >= index.n_docs:
        msg = "remove_docs would remove every document; build a fresh index instead"
        raise ValueError(msg)

    bc = spark.sparkContext.broadcast(removed_idx)

    @F.pandas_udf("long")
    def survivor_rank(idx: pd.Series) -> pd.Series:
        rem = bc.value
        old = idx.to_numpy()
        return pd.Series(old - np.searchsorted(rem, old, side="right"))

    removed_df = F.broadcast(
        spark.createDataFrame([(int(i),) for i in removed_idx], "doc_idx long")
    )
    doc_map = (
        index.doc_map.join(removed_df, "doc_idx", "left_anti")
        .withColumn("doc_idx", survivor_rank("doc_idx"))
    )
    flat_tf = (
        flat_postings(index)
        .join(removed_df, "doc_idx", "left_anti")
        .withColumn("doc_idx", survivor_rank("doc_idx"))
        .select("term", "doc_idx", "tf")
    )
    return _reindex_flat(doc_map, flat_tf, config)


def remove_docs_df(
    spark: SparkSession,
    index: BM25Index,
    keys: DataFrame,
    config: SparseIndexConfig | None = None,
) -> BM25Index:
    """``remove_docs`` for UNBOUNDED key sets: ``keys`` is a one-column
    DataFrame of doc ids and the removed set never touches the driver.

    Survivor doc_idx compaction (rank among survivors by old doc_idx — the
    rebuild's assignment) runs through the same two-pass zip_with_index the
    from-scratch build uses instead of the driver-broadcast searchsorted,
    and the decoded flats remap through a doc_idx equi-join (one extra
    shuffle of the flat — the price of not holding the removed set
    driver-side).  Digest-equal to ``remove_docs`` / a filtered rebuild
    (differential-tested in tests/test_persistence.py).

    Prefer ``remove_docs`` below ~10^5 removed keys (its filter pass is
    map-side only); ``engine.add_transcripts`` picks automatically.

    The result is returned LINEAGE-TRUNCATED (eager localCheckpoint).  The
    raw plan nests two zip_with_index subtrees plus the posting decode
    under whatever the caller builds next; composed with merge_indexes +
    the final three-table checkpoint, Catalyst re-analysis of that nesting
    alone OOMs a 4 GiB driver at 500 docs (measured — the cost is plan
    DEPTH, not data).  Cutting here keeps every downstream plan shallow
    regardless of how the caller composes maintenance ops.
    """
    import dataclasses

    from baguetter_spark.operators.zipindex import zip_with_index

    config = config or index.config
    keys_df = keys.select(F.col(keys.columns[0]).alias("doc_id")).distinct()
    survivors = index.doc_map.join(keys_df, "doc_id", "left_anti")

    pins: list = []
    mapping, mstats = zip_with_index(
        survivors, ["doc_idx"], "new_doc_idx", extra_sums={}, cleanup=pins
    )
    doc_map = mapping.select(
        F.col("new_doc_idx").alias("doc_idx"), "doc_id", "doc_len"
    )
    # survivor count rides the zipindex counts pass — no extra job
    n_surv = int(mstats["count"])
    if n_surv == index.n_docs:  # nothing matched (reference pop(key, None))
        for df in pins:
            df.unpersist(blocking=False)
        return index
    if n_surv == 0:
        msg = "remove_docs_df would remove every document; build a fresh index instead"
        raise ValueError(msg)

    flat_tf = (
        flat_postings(index)
        .join(mapping.select("doc_idx", "new_doc_idx"), "doc_idx")
        .select("term", F.col("new_doc_idx").alias("doc_idx"), "tf")
    )
    out = _reindex_flat(doc_map, flat_tf, config)
    # truncate_lineage materializes the checkpoints, then releases the
    # superseded pins (out.caches + the zipindex two-pass state)
    return truncate_lineage(dataclasses.replace(out, caches=out.caches + tuple(pins)))

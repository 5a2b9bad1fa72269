"""Distributed segment merge: merge(build(A), build(B)) == build(A ∪ B).

The reference rebuilds the whole index on every add/remove
(`baguetter/indices/sparse/base.py:244-256`).  At 10^12-turn scale we keep
that SEMANTIC (global df/avg_doc_len/N and sorted-rank vocabulary are
recomputed over the union) while skipping the expensive part: segments store
raw term frequencies in their posting blocks, so a merge

1. offsets each segment's doc ids by the cumulative doc count of the
   segments before it (segment order == insertion order),
2. decodes (term, doc_idx, tf) from the blocks (no re-tokenization),
3. unions the flats + doc maps, recomputes global stats, re-derives the
   vocabulary (term ids change — they are sorted ranks over the union),
4. recomputes impacts and reassembles blocks.

The result is bit-identical to a from-scratch build of the concatenated
corpus (differential-tested), because impacts are pure functions of
(tf, doc_len, df, N, avg_doc_len).
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
    doc_map = doc_map.persist()

    flat_tf = flats[0]
    for fl in flats[1:]:
        flat_tf = flat_tf.unionByName(fl)

    n_docs, avg_doc_len = corpus_stats(doc_map)

    # re-derive the 8-byte term keys from the decoded strings (segments may
    # predate hashed vocab columns); string witnesses stay fully populated
    # here — merge decode is already string-bound, not the hot build path
    tf = (
        flat_tf.join(doc_map.select("doc_idx", "doc_len"), "doc_idx")
        .select("doc_idx", "doc_len", "term", "tf")
        .withColumn("term_hash", term_hash_udf()(F.col("term")))
    )
    vocab = build_vocab(tf, n_docs, avg_doc_len, config).cache()
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
    )

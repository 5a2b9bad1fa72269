"""Per-stage timing of the index build at a given core count (pinned by the
caller with taskset).  Diagnoses which stage anti-scales from 8 -> 32 cores.

Usage: taskset -c 0-7 python scripts/diag_scaling.py 8 [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> None:
    cores = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators import indexer
    from baguetter_spark.operators.zipindex import zip_with_index

    tpath = os.path.join(REPO, ".bench_cache", f"transcripts_{n_turns}_seed42.parquet")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"diag-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "20g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)

    # warm up python workers
    warm = transcripts.limit(64 * cores).repartition(cores)

    def _noop(batches):
        for pdf in batches:
            yield pdf[["conv_id"]]

    warm.mapInPandas(_noop, schema="conv_id string").count()

    config = SparseIndexConfig(preprocessor=TextPreprocessorConfig())
    timings: dict[str, float] = {}

    t = time.time()
    docs = indexer.docs_from_transcripts(transcripts)
    ranged = zip_with_index(
        docs.select("conv_id", "turn_idx", "doc_id", "text"),
        ["conv_id", "turn_idx"],
        "doc_idx",
    ).select("doc_idx", "doc_id", "text")
    ranged = ranged.persist()
    ranged.count()
    timings["s1_zipindex"] = time.time() - t

    t = time.time()
    tf = indexer.local_term_frequencies(ranged, config).persist()
    tf.count()
    timings["s2_tokenize_tf"] = time.time() - t

    t = time.time()
    doc_lens = tf.groupBy("doc_idx").agg(F.sum("tf").cast("int").alias("doc_len"))
    doc_map = (
        ranged.select("doc_idx", "doc_id")
        .join(doc_lens, "doc_idx", "left")
        .fillna(0, subset=["doc_len"])
        .persist()
    )
    n_docs, avg_doc_len = indexer.corpus_stats(doc_map)
    timings["s3_docmap_stats"] = time.time() - t

    t = time.time()
    vocab = indexer.build_vocab(tf, n_docs, avg_doc_len, config).persist()
    vocab.count()
    timings["s4_vocab"] = time.time() - t

    t = time.time()
    flat = indexer.impacts_flat(tf, vocab, n_docs, avg_doc_len, config)
    postings = indexer.assemble_posting_blocks(flat, config).persist()
    postings.count()
    timings["s5_impacts_blocks"] = time.time() - t

    timings["total"] = sum(timings.values())
    print(json.dumps({"cores": cores, **{k: round(v, 1) for k, v in timings.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()

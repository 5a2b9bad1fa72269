"""Per-stage timing of the SORTED-path index build (the scaling campaign's
measured job) at a given core count.  Pin with taskset, run at 2 and 8 cores,
compare per-stage speedups to find what anti-scales.

Usage: taskset -c 0-1 python scripts/diag_sorted.py 2 [n_turns]

Stages (matching build_index(assume_sorted=True) + the campaign's
materialization set postings.count() + doc_map.count()):
  s0_layout        partition_layout narrow verify pass + collect
  s1_tokenize_tf   presorted_local_tf persist + count
  s2_vocab         hashed_term_stats persist + zipWithIndex + vocab cache
  s3_impacts_blocks impacts join + repartition + sort + run-encode + count
  s4_doc_map       presorted_keys pass + doc_lens agg + join + count

The second repetition (same warmed JVM) is the recorded one, mirroring the
campaign's cold+warm runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
os.environ["MALLOC_MMAP_THRESHOLD_"] = str(256 * 1024 * 1024)
os.environ["ARROW_DEFAULT_MEMORY_POOL"] = "system"


def main() -> None:
    cores = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators import indexer
    from baguetter_spark.operators.presorted import (
        partition_layout,
        presorted_keys,
        presorted_local_tf,
    )
    from baguetter_spark.operators.zipindex import zip_with_index

    tpath = os.path.join(REPO, ".bench_cache", f"transcripts_{n_turns}_seed42.parquet")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"diag-sorted-{cores}")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SCALING_SHUFFLE_PARTITIONS", str(max(cores * 2, 16))),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "20g")
        .config("spark.driver.extraJavaOptions", "-Xms20g")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)
    print(json.dumps({"input_partitions": transcripts.rdd.getNumPartitions()}))

    warm = transcripts.limit(64 * cores).repartition(cores)

    def _noop(batches):
        for pdf in batches:
            yield pdf[["conv_id"]]

    warm.mapInPandas(_noop, schema="conv_id string").count()

    config = SparseIndexConfig(preprocessor=TextPreprocessorConfig())

    for rep in range(2):
        # Spark's CacheManager matches canonicalized plans: without this,
        # rep 1's persist()+count() of an identical plan silently READS
        # rep 0's cached data instead of rebuilding, inflating "warm"
        # timings (observed: 150s fake vs 215s real at 4c/4M)
        spark.catalog.clearCache()
        timings: dict[str, float] = {}

        t = time.time()
        layout = partition_layout(transcripts)
        assert layout is not None and layout.n_rows == n_turns
        timings["s0_layout"] = time.time() - t

        t = time.time()
        tf = presorted_local_tf(transcripts, layout, config).persist()
        tf.count()
        timings["s1_tokenize_tf"] = time.time() - t

        t = time.time()
        term_stats = indexer.hashed_term_stats(tf).persist()
        vocab_base, vstats = zip_with_index(
            term_stats,
            ["term"],
            "term_id",
            extra_sums={
                "total_len": "ttf",
                "total_postings": "df",
                "hash_collisions": "coll",
            },
        )
        n_docs = layout.n_rows
        avg_doc_len = float(vstats["total_len"]) / n_docs
        vocab = indexer.vocab_scores(
            vocab_base.select("term_id", "term_hash", "term", "df"),
            n_docs,
            avg_doc_len,
            config,
        ).cache()
        vocab.count()
        timings["s2_vocab"] = time.time() - t

        t = time.time()
        flat = indexer.impacts_flat(tf, vocab, n_docs, avg_doc_len, config)
        postings = indexer.assemble_posting_blocks(flat, config).persist()
        n_blocks = postings.count()
        timings["s3_impacts_blocks"] = time.time() - t

        t = time.time()
        keys = presorted_keys(transcripts, layout)
        doc_lens = tf.groupBy("doc_idx").agg(F.sum("tf").cast("int").alias("doc_len"))
        doc_map = (
            keys.join(doc_lens, "doc_idx", "left")
            .fillna(0, subset=["doc_len"])
            .persist()
        )
        doc_map.count()
        timings["s4_doc_map"] = time.time() - t

        timings["total"] = sum(timings.values())
        print(
            json.dumps(
                {
                    "cores": cores,
                    "rep": rep,
                    "n_blocks": n_blocks,
                    **{k: round(v, 1) for k, v in timings.items()},
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()

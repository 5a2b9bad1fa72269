"""Scaling-efficiency evidence for the north rule (no real cluster in the
sandbox): run the SAME index-build job on the SAME input at local[N] and
local[4N] and report throughput at both plus efficiency
eff = tput_4N / (4 * tput_N).  Results go to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_turns] [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def run_build(cores: int, tpath: str, n_turns: int) -> float:
    from pyspark.sql import SparkSession

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators.indexer import build_index

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)
    # warm-up: JVM + python worker pool (excluded from the measurement)
    transcripts.limit(1000).count()
    t0 = time.time()
    idx = build_index(
        spark, transcripts, SparseIndexConfig(preprocessor=TextPreprocessorConfig())
    )
    idx.postings.count()
    dt = time.time() - t0
    spark.stop()
    return n_turns / dt


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    tpath = os.path.join(cache_dir, f"transcripts_{n_turns}_seed42.parquet")
    if not os.path.exists(tpath):
        from baguetter_spark.fixtures import gen_transcripts

        gen_transcripts(n_turns, seed=42, vocab_size=20_000).to_parquet(tpath, index=False)

    tput_n = run_build(n_cores, tpath, n_turns)
    tput_4n = run_build(n_cores * 4, tpath, n_turns)
    eff = tput_4n / (4 * tput_n)
    out = {
        "n_turns": n_turns,
        "cores_N": n_cores,
        "cores_4N": n_cores * 4,
        "turns_per_sec_N": round(tput_n, 1),
        "turns_per_sec_4N": round(tput_4n, 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

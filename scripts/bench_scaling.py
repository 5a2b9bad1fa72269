"""Scaling-efficiency evidence for the north rule (no real cluster in the
sandbox): run the SAME index-build job on the SAME input at N and 4N cores
and report throughput at both plus efficiency eff = tput_4N / (4 * tput_N).

Each measurement runs in a subprocess pinned with ``taskset`` to exactly the
measured core count — otherwise a local[8] run's Python UDF workers would
silently borrow the machine's idle cores and understate the true 4x speedup.
Results go to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_turns] [N] [trials] [mode]
  mode: "sorted" (default — build_index(assume_sorted=True), the production
        path for an Iceberg/parquet table sorted by its key; the build
        VERIFIES the ordering and falls back if it doesn't hold) or
        "general" (range-shuffle zipWithIndex path).
Self-mode (internal): python scripts/bench_scaling.py --one <cores> <tpath> <n_turns> <mode>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def run_build_once(cores: int, tpath: str, n_turns: int, mode: str = "sorted") -> None:
    """Child mode: one pinned measurement, prints seconds on stdout."""
    from pyspark.sql import SparkSession

    from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
    from baguetter_spark.operators.indexer import build_index

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "20g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(tpath)
    # warm-up (excluded from the measurement): JVM codegen AND the Python
    # worker pool — run a tiny pandas UDF through every core so worker
    # processes exist and pandas/numpy are imported before the clock starts
    # (a long-lived cluster is warm; cold-start is not what the rule measures)
    warm = transcripts.limit(64 * cores).repartition(cores)

    def _noop(batches):
        for pdf in batches:
            yield pdf[["conv_id"]]

    warm.mapInPandas(_noop, schema="conv_id string").count()
    t0 = time.time()
    idx = build_index(
        spark,
        transcripts,
        SparseIndexConfig(preprocessor=TextPreprocessorConfig()),
        assume_sorted=(mode == "sorted"),
    )
    idx.postings.count()
    idx.doc_map.count()  # materialize the full index, not just postings
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({"seconds": dt}))


def membw_probe() -> float:
    """Single-process numpy memcpy bandwidth (GB/s) — a 1-2 s machine-health
    probe run before each leg.  This VM's throughput swings ±30% with
    hypervisor neighbors (BENCH/BASELINE.md "Machine ceiling"); annotating
    every trial with the concurrent bandwidth lets the record separate
    scheduler/code effects from box weather."""
    import numpy as np

    src = np.ones(64 * 1024 * 1024 // 8, dtype=np.float64)  # 64 MiB
    t0 = time.time()
    n = 0
    while time.time() - t0 < 1.2:
        _dst = src.copy()
        n += 1
    dt = time.time() - t0
    return round(n * 2 * src.nbytes / dt / 1e9, 2)  # read+write bytes


def measure(cores: int, tpath: str, n_turns: int, mode: str = "sorted") -> float:
    cpu_list = f"0-{cores - 1}"
    out = subprocess.run(
        [
            "taskset", "-c", cpu_list,
            sys.executable, os.path.abspath(__file__),
            "--one", str(cores), tpath, str(n_turns), mode,
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    dt = json.loads(last)["seconds"]
    return n_turns / dt


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        mode = sys.argv[5] if len(sys.argv) > 5 else "sorted"
        run_build_once(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), mode)
        return

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    mode = sys.argv[4] if len(sys.argv) > 4 else "sorted"

    cache_dir = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tpath = os.path.join(cache_dir, f"transcripts_{n_turns}_seed42.parquet")
    if not os.path.exists(tpath):
        from baguetter_spark.fixtures import gen_transcripts

        # row_group_size: a real sorted table has many files/row groups; one
        # giant pandas-default row group would collapse the presorted path's
        # scan parallelism (every row in one split)
        gen_transcripts(n_turns, seed=42, vocab_size=20_000).to_parquet(
            tpath, index=False, row_group_size=125_000
        )

    # This VM's run-to-run throughput noise is +-20-30% (hypervisor/
    # neighbor effects), so legs are measured in interleaved trials and the
    # per-leg MEDIAN is the recorded number (best also reported).
    runs_n: list[float] = []
    runs_4n: list[float] = []
    bw: list[float] = []
    for t in range(trials):
        bw_t = membw_probe()
        bw.append(bw_t)
        runs_n.append(measure(n_cores, tpath, n_turns, mode))
        runs_4n.append(measure(n_cores * 4, tpath, n_turns, mode))
        print(
            json.dumps(
                {
                    "trial": t,
                    "membw_gbps": bw_t,
                    "turns_per_sec_N": round(runs_n[-1], 1),
                    "turns_per_sec_4N": round(runs_4n[-1], 1),
                    "eff": round(runs_4n[-1] / (4 * runs_n[-1]), 3),
                }
            ),
            flush=True,
        )

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    tput_n, tput_4n = median(runs_n), median(runs_4n)
    out = {
        "n_turns": n_turns,
        "cores_N": n_cores,
        "cores_4N": n_cores * 4,
        "trials": trials,
        "turns_per_sec_N": round(tput_n, 1),
        "turns_per_sec_4N": round(tput_4n, 1),
        "scaling_efficiency": round(tput_4n / (4 * tput_n), 3),
        "best_N": round(max(runs_n), 1),
        "best_4N": round(max(runs_4n), 1),
        "scaling_efficiency_best": round(max(runs_4n) / (4 * max(runs_n)), 3),
        "pinned": "taskset",
        "mode": mode,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

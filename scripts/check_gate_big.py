"""10x-scale gate sweep (round-4 VERDICT item 6): run the FULL gate
registry on a corpus ~10x the driver's largest SF, Spark vs DuckDB, with a
COUNT-verify fallback for rows whose output is too large to collect.

    python scripts/check_gate_big.py [name_filter] [--scale K] [--dir D]
                                     [--regen] [--json OUT.json]
                                     [--collect-cap N]

The corpus (default ``.bench_cache/sfbig``) is generated deterministically
from seed 777 when the directory is missing (or ``--regen``): documents =
scale*5000 docs over a ~40-word Zipf vocab with injected exact and
near-duplicates (the same shape as the driver's sf tables — small vocab so
dedup/simhash rows produce DEGENERATE, quadratic-output classes, which is
exactly the scale hazard the sweep exists to exercise), embeddings =
scale*2000 64-dim float32 vectors in 10 Gaussian clusters.  Only
``documents``/``embeddings`` are read by gate queries.

Compare protocol: identical to scripts/check_gate.py (row count + schema +
order-insensitive values) for any row whose Spark output is within
``--collect-cap`` rows (default 2M).  Beyond the cap, pandas collection is
infeasible (round 4: ``dedup_simhash_pairs`` yields 131,882,406 pairs on
this corpus — a data property, the 40-word vocab makes Hamming<=3 classes
enormous), so the row is verified by EXACT COUNT: Spark ``count()`` ==
DuckDB ``COUNT(*)`` over the same oracle SQL — recorded as ``COUNT-OK``,
a pre-registered weaker check the JSON artifact labels explicitly.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb  # noqa: E402

from check_gate import canon  # noqa: E402

SEED = 777
VOCAB = (
    "spark batch line column order sort filter query group hash join scan "
    "shuffle merge cache row value key data stream agg window part term doc "
    "index score rank fast slow small big wide deep cold warm dense sparse "
    "flat nested"
).split()  # 40 words


def gen_corpus(out_dir: str, scale: int) -> None:
    """Deterministic 10x-shape corpus (seed 777).  Every 8th doc is a
    near-dup of its predecessor (one token mutated), every 16th an EXACT
    dup — so exact/ngram/minhash/simhash rows all have non-trivial
    positives; embeddings are 10 Gaussian clusters (IVF-meaningful)."""
    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_docs = scale * 5000
    langs = ["en", "zh", "de", "fr", "es", "ru", "ja", "pt", "it", "ko"]
    # Zipf ranks over the 40-word vocab
    probs = 1.0 / np.arange(1, len(VOCAB) + 1)
    probs /= probs.sum()
    texts: list[str] = []
    for d in range(n_docs):
        if d % 16 == 15 and texts:
            texts.append(texts[-1])  # exact dup
            continue
        if d % 8 == 7 and texts:
            toks = texts[-1].split()
            toks[int(rng.integers(0, len(toks)))] = "mutant"
            texts.append(" ".join(toks))  # near dup
            continue
        n_tok = int(rng.integers(20, 80))
        toks = rng.choice(VOCAB, size=n_tok, p=probs)
        texts.append(" ".join(toks))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": [langs[d % len(langs)] for d in range(n_docs)],
            "source": [f"src{d % 10}" for d in range(n_docs)],
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)

    n_vecs = scale * 2000
    dim = 64
    centers = rng.normal(0, 1.0, size=(10, dim))
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + rng.normal(0, 0.15, size=(n_vecs, dim))
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": labels.astype(np.int64),
        }
    )
    emb.to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)


def main() -> int:
    args = sys.argv[1:]
    flags: dict[str, str] = {}
    pos: list[str] = []
    regen = False
    i = 0
    while i < len(args):
        if args[i] == "--regen":
            regen = True
            i += 1
        elif args[i].startswith("--") and i + 1 < len(args):
            flags[args[i]] = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    name_filter = pos[0] if pos else ""
    scale = int(flags.get("--scale", "10"))
    sf_dir = flags.get("--dir", os.path.join(REPO, ".bench_cache", "sfbig"))
    json_out = flags.get("--json")
    collect_cap = int(flags.get("--collect-cap", str(2_000_000)))

    if regen or not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        print(f"generating scale-{scale} corpus (seed {SEED}) at {sf_dir} ...")
        gen_corpus(sf_dir, scale)

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-check-big")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures: list[str] = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        sdf_lazy = fn(spark, sf_dir)
        if name not in sqls:
            n = sdf_lazy.count()
            dt = time.time() - t0
            print(f"  {name}: rows-only, {n} rows ({dt:.1f}s)")
            record[name] = {"status": "ROWS-ONLY", "rows": n,
                            "oracle_checked": False, "duration_s": round(dt, 1)}
            continue
        n_spark = sdf_lazy.count()
        if n_spark > collect_cap:
            # count-verify fallback (pre-registered weaker check)
            n_oracle = con.execute(
                f"SELECT COUNT(*) FROM ({sqls[name]})"
            ).fetchone()[0]
            status = "COUNT-OK" if n_spark == n_oracle else "COUNT-MISMATCH"
            dt = time.time() - t0
            print(f"  {name}: {status} spark={n_spark} oracle={n_oracle} "
                  f"({dt:.1f}s) [output beyond --collect-cap {collect_cap}]")
            record[name] = {"status": status, "rows": n_spark,
                            "oracle_rows": n_oracle, "oracle_checked": True,
                            "count_only": True, "duration_s": round(dt, 1)}
            if status != "COUNT-OK":
                failures.append(name)
            continue
        sdf = sdf_lazy.toPandas()
        ddf = con.execute(sqls[name]).df()
        a, b = canon(sdf), canon(ddf)
        status = "OK"
        detail = ""
        if list(a.columns) != list(b.columns):
            status = "SCHEMA-MISMATCH"
            detail = f"{list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status = "ROWCOUNT-MISMATCH"
            detail = f"{len(a)} vs {len(b)}"
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            status = "VALUE-MISMATCH"
            detail = f"{int(bad.sum())}/{len(a)} rows differ"
        dt = time.time() - t0
        print(f"  {name}: {status} rows={len(a)} ({dt:.1f}s) {detail[:300]}")
        record[name] = {"status": status, "rows": len(a), "oracle_rows": len(b),
                        "oracle_checked": True, "count_only": False,
                        "duration_s": round(dt, 1)}
        if status != "OK":
            failures.append(name)
    ok = sum(1 for r in record.values() if r["status"] in ("OK", "COUNT-OK"))
    if json_out:
        payload = {"sf_dir": sf_dir, "scale": scale, "seed": SEED,
                   "collect_cap": collect_cap,
                   "name_filter": name_filter or None,
                   "registered_queries": len(qs), "checked": len(record),
                   "ok": ok, "failed": failures, "results": record}
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {json_out}")
    if failures:
        print("FAILED:", failures)
        return 1
    print(f"all big-gate checks OK ({ok}/{len(record)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

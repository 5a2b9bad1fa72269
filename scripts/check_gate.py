"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row-count + schema-ish + order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        if name not in sqls:
            print(f"  {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
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
            detail = f"{int(bad.sum())}/{len(a)} rows differ; first:\n{a[bad].head(3)}\nvs\n{b[bad].head(3)}"
        print(f"  {name}: {status} rows={len(a)} ({time.time()-t0:.1f}s) {detail[:500]}")
        if status != "OK":
            failures.append(name)
    if failures:
        print("FAILED:", failures)
        return 1
    print("all gate checks OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

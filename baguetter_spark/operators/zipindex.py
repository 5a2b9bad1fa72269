"""Scalable stable zipWithIndex: dense 0-based ids in a total sort order.

The reference assigns doc ids by insertion order (``key_mapping =
dict(enumerate(keys))``, `baguetter/indices/sparse/base.py:251`) and term ids
by rank in the sorted vocabulary (`.../models/bm25/scoring.py:303-307`).  Both
need a *global* dense rank.  A single ``row_number() OVER (ORDER BY ...)``
window funnels all rows through ONE task — fine at 10^5 rows, fatal at 10^12.

This operator does the classic two-pass instead:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order columns
   (one range shuffle; ranges are contiguous and ordered by partition id);
2. count rows per partition (cheap scan), prefix-sum the counts on the
   driver (#partitions entries, not #rows);
3. ``mapInPandas`` assigns ``offset[pid] + local_position`` with no further
   shuffle.

Deterministic for a unique total order; every stage is parallel.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zip_with_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str,
    *,
    num_partitions: int | None = None,
    extra_sums: dict[str, str] | None = None,
    cleanup: list | None = None,
):
    """Add a dense 0-based ``index_col`` ranking rows by ``order_cols``.

    The order defined by ``order_cols`` must be total (no duplicate keys) for
    the result to be deterministic.

    ``extra_sums`` ({out_name: column_name}) piggybacks global scalar SUMs
    onto the pass-1 counts job (summed per partition, combined driver-side)
    so callers don't pay a separate Spark job + barrier per scalar stat.
    When provided, returns ``(df, stats)`` where stats holds each requested
    sum plus the total row count under ``"count"``; otherwise returns df.

    ``cleanup``: the two-pass state below is a ``persist()`` whose
    CacheManager entry is NEVER garbage-collected; pass a list and the
    pinned frame is appended so the caller can ``unpersist()`` it once the
    result has been materialized downstream (checkpoint / parquet write).
    Without it, chained maintenance loops leak one pinned frame per call.
    """
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    parts = int(parts)
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)

    # CRITICAL: persist before reading partition ids.  The counts job and the
    # assignment job are separate Spark jobs; with AQE enabled the shuffle
    # can be coalesced DIFFERENTLY per job, which would change partition ids
    # between pass 1 and pass 2 and corrupt the offsets.  Persisting pins one
    # materialized partitioning that both passes read.
    from pyspark import StorageLevel

    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if cleanup is not None:
        cleanup.append(with_pid)
    # Pass 1: per-partition counts -> driver-side prefix sums (#partitions rows)
    agg_exprs = [F.count("*").alias("__cnt")] + [
        F.sum(c).alias(f"__s_{k}") for k, c in (extra_sums or {}).items()
    ]
    pass1 = with_pid.groupBy("__pid").agg(*agg_exprs).collect()
    counts = {r["__pid"]: r["__cnt"] for r in pass1}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(with_pid.schema.fields) + [StructField(index_col, LongType(), False)]
    )
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{index_col: pd.Series([], dtype="int64")})
                continue
            pid = int(pdf["__pid"].iloc[0])
            start = b_offsets.value[pid] + local
            pdf = pdf.copy()
            pdf[index_col] = range(start, start + len(pdf))
            local += len(pdf)
            yield pdf

    result = with_pid.mapInPandas(assign, schema=out_schema).drop("__pid")
    if extra_sums is None:
        return result
    stats: dict[str, int] = {"count": int(acc)}
    for k in extra_sums:
        stats[k] = int(sum((r[f"__s_{k}"] or 0) for r in pass1))
    return result, stats

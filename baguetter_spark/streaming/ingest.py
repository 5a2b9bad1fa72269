"""Structured-Streaming transcript ingestion.

The reference has no streaming surface (every add is a full in-memory
rebuild, `baguetter/indices/sparse/base.py:244-256`); at 10^12-turn scale
ingestion is continuous, so the Spark-native design is:

- ``stream_ingest``: file-source readStream -> exactly-once parquet append
  of raw turns (checkpointed; per-turn text bytes pass through UNTOUCHED —
  the byte-identity invariant is on this path);
- ``stream_turn_stats``: watermarked windowed aggregation (turns per
  window x role) — the standard late-data pattern;
- ``stream_build_segments``: foreachBatch -> one immutable index segment per
  micro-batch (saved via io.save_index); segments are later unified by
  merge.merge_indexes (merge == rebuild semantics), giving an LSM-style
  incremental index consistent with the reference's rebuild contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baguetter_spark.config import SparseIndexConfig
from baguetter_spark.schema import TRANSCRIPTS_SCHEMA


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Append-only exactly-once ingestion of transcript parquet drops."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    watermark: str | None = None,
):
    """Stateful streaming exact-dedup ingestion: exactly one surviving row
    per distinct text digest ACROSS micro-batches (and across restarts —
    the dedup state lives in the checkpoint).

    State policy: with ``watermark=None`` the digest state grows with the
    number of distinct documents (exact forever-dedup — the semantics batch
    ``exact_duplicates`` has).  At 100 TB that state is itself large, so
    production streams should pass a watermark (e.g. ``"7 days"``) to use
    ``dropDuplicatesWithinWatermark`` — bounded state, dedup guaranteed only
    within the watermark horizon; which-row-survives within a digest group
    is arbitrary either way (the digest SET is the deterministic output).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(source_dir)
        .withColumn("digest", F.md5("text"))
    )
    if watermark is not None:
        stream = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    else:
        stream = stream.dropDuplicates(["digest"])
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_turn_stats(spark: SparkSession, source_dir: str) -> DataFrame:
    """Watermarked windowed aggregation: turns per (10-minute window, role).
    Late turns beyond the 30-minute watermark are dropped deterministically."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )


_DUR_UNITS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _duration_ms(dur: str) -> int:
    n, unit = dur.strip().split()
    return int(n) * _DUR_UNITS[unit.lower()]


def stream_conversation_sessions(
    spark: SparkSession,
    source_dir: str,
    *,
    gap: str = "30 minutes",
):
    """Custom stateful operator via ``applyInPandasWithState``: per-
    conversation running session state (turn count, char count, first/last
    event time) maintained across micro-batches, emitted when the
    conversation times out on the event-time watermark (no new turns
    within ``gap``).

    The built-in ``session_window`` covers plain gap-sessionization; this
    kernel exists for the state shapes it cannot express (running
    aggregates over the session that are not algebraic — here the turn
    sequence is summarized with a rolling order-sensitive fingerprint of
    per-turn text lengths, the kind of custom state a dedup/quality
    pipeline keeps per conversation).

    State per group is O(1) (five scalars) — the 100 TB shape: state size
    scales with #live conversations, not #turns.
    """
    from typing import Any, Iterator as _Iter, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("n_turns", LongType()),
            StructField("n_chars", LongType()),
            StructField("first_ts", TimestampType()),
            StructField("last_ts", TimestampType()),
            StructField("len_fingerprint", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_turns", LongType()),
            StructField("n_chars", LongType()),
            StructField("first_ts_us", LongType()),
            StructField("last_ts_us", LongType()),
            StructField("fp", LongType()),
        ]
    )
    mod = 2147483647  # rolling fingerprint modulus (FP_MOD of textstats)

    def update(
        key: Tuple[str], pdfs: _Iter[pd.DataFrame], state: GroupState
    ) -> _Iter[pd.DataFrame]:
        if state.hasTimedOut:
            n_turns, n_chars, first_us, last_us, fp = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n_turns],
                    "n_chars": [n_chars],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "len_fingerprint": [fp],
                }
            )
            return
        n_turns, n_chars, first_us, last_us, fp = (
            state.get if state.exists else (0, 0, None, None, 0)
        )
        for pdf in pdfs:
            for turn_idx, text, ts in zip(pdf["turn_idx"], pdf["text"], pdf["ts"]):
                ln = len(text) if isinstance(text, str) else 0
                n_turns += 1
                n_chars += ln
                # commutative fold keyed by turn_idx: out-of-order arrivals
                # split across micro-batches fingerprint identically to a
                # single in-order batch (replay-deterministic under any
                # trigger slicing — an order-sensitive rolling hash is not)
                fp = (fp + (int(turn_idx) + 1) * 1000003 + ln + 7) % mod
                us = int(pd.Timestamp(ts).value // 1000)
                first_us = us if first_us is None else min(first_us, us)
                last_us = us if last_us is None else max(last_us, us)
        state.update((n_turns, n_chars, first_us, last_us, fp))
        # timeout = max(last event, watermark) + gap: cannot be set older
        # than the current watermark, and a conversation stays live while
        # new turns keep arriving
        gap_ms = _duration_ms(gap)
        base_ms = max(last_us // 1000, state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(base_ms + gap_ms)
        return

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_build_segments(
    spark: SparkSession,
    source_dir: str,
    segments_dir: str,
    checkpoint_dir: str,
    config: SparseIndexConfig | None = None,
    *,
    available_now: bool = True,
):
    """foreachBatch segment builder: every micro-batch becomes one immutable
    saved index segment under ``segments_dir/segment_<epoch>`` — the
    streaming half of the LSM design (merge.merge_indexes is the other)."""
    from baguetter_spark.io import save_index
    from baguetter_spark.operators.indexer import build_index

    cfg = config or SparseIndexConfig()
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)

    def build_segment(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index = build_index(spark, batch_df, cfg)
        save_index(index, os.path.join(segments_dir, f"segment_{epoch_id:06d}"))

    writer = (
        stream.writeStream.foreachBatch(build_segment)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

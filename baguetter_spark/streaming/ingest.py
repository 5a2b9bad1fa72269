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

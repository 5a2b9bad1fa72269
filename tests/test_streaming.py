"""Structured-Streaming ingestion: exactly-once file ingest (byte-identity
invariant), watermarked windowed aggregation, foreachBatch segment builds
merged == batch rebuild."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from baguetter_spark.config import SparseIndexConfig, TextPreprocessorConfig
from baguetter_spark.fixtures import gen_transcripts
from baguetter_spark.io import load_index
from baguetter_spark.merge import merge_indexes
from baguetter_spark.operators.indexer import build_index
from baguetter_spark.operators.search import score_queries
from baguetter_spark.streaming.ingest import (
    stream_build_segments,
    stream_ingest,
    stream_turn_stats,
)


@pytest.fixture()
def source_dir(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    # two "drops" of transcripts (disjoint conversations)
    a = gen_transcripts(30, 5, seed=41, vocab_size=60)
    b = gen_transcripts(30, 5, seed=43, vocab_size=60)
    b["conv_id"] = "z" + b["conv_id"]
    spark.createDataFrame(a).write.parquet(str(src / "drop_a"))
    spark.createDataFrame(b).write.parquet(str(src / "drop_b"))
    # file source reads a flat dir: re-point to the parquet files via glob dir
    flat = tmp_path / "flat"
    flat.mkdir()
    for d in ("drop_a", "drop_b"):
        for f in os.listdir(src / d):
            if f.endswith(".parquet"):
                os.link(src / d / f, flat / f"{d}_{f}")
    return str(flat), pd.concat([a, b], ignore_index=True)


def test_stream_ingest_byte_identity(spark, tmp_path, source_dir):
    src, expected = source_dir
    out = str(tmp_path / "out")
    q = stream_ingest(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == len(expected)
    # per-turn text byte-identity under stable (conv_id, turn_idx) order
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    e = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(g["text"]) == list(e["text"])
    # exactly-once: restarting the stream ingests nothing new
    q2 = stream_ingest(spark, src, out, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(expected)


def test_stream_dedup_state_survives_micro_batches(spark, tmp_path):
    """The dedup state must hold ACROSS stream restarts on one checkpoint:
    a text ingested in run 1 must not re-emit when a later drop repeats it,
    and distinct digests must each survive exactly once."""
    import pandas as pd

    from baguetter_spark.streaming.ingest import stream_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ts = pd.Timestamp("2025-01-01")

    def drop(name, rows):
        from baguetter_spark.schema import TRANSCRIPTS_SCHEMA

        sdf = spark.createDataFrame(
            [(c, 0, "user", t, None, ts.to_pydatetime()) for c, t in rows],
            schema=TRANSCRIPTS_SCHEMA,
        )
        sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import os, shutil

        for f in os.listdir(tmp_path / name):
            if f.endswith(".parquet"):
                shutil.copy(tmp_path / name / f, src / f"{name}.parquet")

    # run 1: three texts, one internal duplicate
    drop("d1", [("a", "alpha text"), ("b", "beta text"), ("c", "alpha text")])
    stream_dedup_ingest(spark, str(src), out, ckpt).awaitTermination(120)
    got1 = spark.read.parquet(out).toPandas()
    assert sorted(got1["text"].unique()) == ["alpha text", "beta text"]
    assert len(got1) == 2

    # run 2 (same checkpoint): repeats run-1 texts + one new — only the new
    # text may emit, proving the digest state crossed the restart
    drop("d2", [("x", "alpha text"), ("y", "gamma text"), ("z", "beta text")])
    stream_dedup_ingest(spark, str(src), out, ckpt).awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 3
    assert sorted(got2["text"]) == ["alpha text", "beta text", "gamma text"]


def test_stream_conversation_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: per-conversation state
    accumulates across micro-batches and emits on event-time timeout.
    Drop 2's much-later timestamps advance the watermark past drop 1's
    conversations + gap, so exactly those sessions emit, with turn/char
    counts and the order-sensitive length fingerprint accumulated in
    state."""
    import pandas as pd

    from baguetter_spark.schema import TRANSCRIPTS_SCHEMA
    from baguetter_spark.streaming.ingest import stream_conversation_sessions

    src = tmp_path / "src"
    src.mkdir()

    def drop(name, rows):
        sdf = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)
        d = tmp_path / name
        sdf.coalesce(1).write.mode("overwrite").parquet(str(d))
        import os, shutil

        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(d / f, src / f"{name}.parquet")

    t = pd.Timestamp("2025-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    drop(
        "d1",
        [
            ("convA", 0, "user", "hello", None, t.to_pydatetime()),
            ("convA", 1, "assistant", "hi there", None, (t + m).to_pydatetime()),
            ("convB", 0, "user", "xyz", None, (t + 2 * m).to_pydatetime()),
        ],
    )

    out = str(tmp_path / "out")

    def run():
        q = (
            stream_conversation_sessions(spark, str(src), gap="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 0  # nothing timed out yet

    # drop 2: a turn 10 hours later pushes the watermark past drop 1 + gap
    drop(
        "d2",
        [("convC", 0, "user", "late", None, (t + pd.Timedelta(hours=10)).to_pydatetime())],
    )
    run()
    rows = {r["conv_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"convA", "convB"}
    a = rows["convA"]
    assert a["n_turns"] == 2
    assert a["n_chars"] == len("hello") + len("hi there")
    assert a["first_ts"] == t.to_pydatetime()
    assert a["last_ts"] == (t + m).to_pydatetime()
    # commutative turn-keyed fingerprint: len("hello")=5, len("hi there")=8
    mod, fp = 2147483647, 0
    for turn_idx, ln in ((0, 5), (1, 8)):
        fp = (fp + (turn_idx + 1) * 1000003 + ln + 7) % mod
    assert a["len_fingerprint"] == fp
    assert rows["convB"]["n_turns"] == 1


def test_stream_turn_stats_schema(spark, tmp_path, source_dir):
    src, expected = source_dir
    agg = stream_turn_stats(spark, src)
    q = (
        agg.writeStream.format("memory")
        .queryName("turnstats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM turnstats").collect()
    assert sum(r["n_turns"] for r in rows) == len(expected)
    assert {r["role"] for r in rows} <= {"user", "assistant", "system", "tool"}


def test_stream_segments_merge_equals_rebuild(spark, tmp_path, source_dir):
    src, expected = source_dir
    cfg = SparseIndexConfig(preprocessor=TextPreprocessorConfig.parity())
    segdir = str(tmp_path / "segments")
    q = stream_build_segments(spark, src, segdir, str(tmp_path / "segckpt"), cfg)
    q.awaitTermination(240)
    segments = sorted(os.listdir(segdir))
    assert len(segments) >= 1
    loaded = [load_index(spark, os.path.join(segdir, s)) for s in segments]
    merged = (
        loaded[0] if len(loaded) == 1 else merge_indexes(spark, loaded, cfg)
    )
    rebuilt = build_index(spark, spark.createDataFrame(expected), cfg)
    assert merged.n_docs == rebuilt.n_docs
    assert merged.total_postings == rebuilt.total_postings
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": ["q0"], "text": ["term00001 term00003 hot00"]})
    )
    rm = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_queries(merged, qdf, top_k=5).collect()
    }
    rr = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_queries(rebuilt, qdf, top_k=5).collect()
    }
    # segment order may differ from (conv_id, turn_idx) global order, so doc
    # ids can differ — but doc_id keys and float32 scores must match
    assert rm == rr

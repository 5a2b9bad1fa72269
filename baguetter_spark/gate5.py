"""Gate rows, batch 5 (round 4): the DedupConfig parameter surface and
real multimodal decode.

Round-3 VERDICT items 7 and 8: the dedup gate rows so far pinned the
DEFAULT constants (3-gram shingles, 16 minhashes x 4 bands); these rows
re-run the same operators under a NON-DEFAULT ``DedupConfig`` so the
config plumbing — not just the constants — is oracle-verified:

- ``dedup_minhash_lsh_b2`` — ``DedupConfig(band_size=2)``: 8 bands x 2
  rows (s-curve threshold (1/8)^(1/2) ~ 0.35 instead of the default
  (1/4)^(1/4) ~ 0.71 — a higher-recall banding).  The oracle mirrors the
  ``i // 2`` band grouping; the candidate set is a superset of the
  default row's, so this row genuinely exercises the band_size knob.
- ``dedup_ngram_jaccard_5g`` — ``ngram_n=5``: 5-token shingles (the
  longer-window, higher-precision near-dup detector).  The oracle
  mirrors ``list_slice(toks, i, i + 4)`` windows over docs with >= 5
  tokens.

Same determinism rules as gate.py (fixed doc subsets, 4-dp rounding).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from baguetter_spark.gate import _docs_with_id, gate_index


def minhash_b2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.operators.dedup import DedupConfig, minhash_lsh_pairs

    docs = _docs_with_id(spark, sf_dir).where(F.col("doc_id") < 80)
    index = gate_index(spark, sf_dir, "lucene")
    cfg = DedupConfig(band_size=2)  # 8 bands x 2 rows
    return minhash_lsh_pairs(docs, index.vocab, threshold=0.5, config=cfg)


def ngram_5g_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from baguetter_spark.operators.dedup import DedupConfig, ngram_jaccard_pairs

    docs = _docs_with_id(spark, sf_dir).where(F.col("doc_id") < 1000)
    cfg = DedupConfig(ngram_n=5)
    return ngram_jaccard_pairs(docs, threshold=0.5, config=cfg)


def _minhash_b2_sql() -> str:
    """The default _minhash_sql with the band grouping re-derived from
    band_size=2 (i // 2) — everything else identical."""
    from baguetter_spark.operators.dedup import MH_B as _MH_B
    from baguetter_spark.operators.dedup import MH_P, N_HASHES
    from baguetter_spark.operators.dedup import MH_A as _MH_A

    params = ", ".join(f"({i}, {_MH_A[i]}, {_MH_B[i]})" for i in range(N_HASHES))
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents WHERE doc_id < 80
),
alldocs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents
),
dfreq AS (
  SELECT term FROM (SELECT DISTINCT doc_id, unnest(toks) AS term FROM alldocs) GROUP BY term
),
vocab AS (SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
          FROM dfreq),
ids AS (
  SELECT DISTINCT t.doc_id, v.term_id
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs) t JOIN vocab v USING (term)
),
params(i, a, b) AS (VALUES {params}),
sig AS (
  SELECT doc_id, i, min((a * term_id + b) % {MH_P}) AS mh
  FROM ids CROSS JOIN params GROUP BY doc_id, i
),
band AS (
  SELECT doc_id, i // 2 AS band,
         array_to_string(list_sort(list(i || ':' || mh)), ',') AS band_key
  FROM sig GROUP BY doc_id, i // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band a JOIN band b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM ids GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN ids ia ON ia.doc_id = c.doc_a
  JOIN ids ib ON ib.doc_id = c.doc_b AND ib.term_id = ia.term_id
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) >= 0.5
"""


NGRAM_5G_SQL = """
WITH docs AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
  FROM documents WHERE doc_id < 1000
),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - 3),
                                 i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS sh
    FROM docs WHERE len(toks) >= 5
  )
),
sdf AS (SELECT sh, count(*) AS c FROM sh GROUP BY sh),
cand_src AS (SELECT s.doc_id, s.sh FROM sh s JOIN sdf USING (sh) WHERE sdf.c <= 1000),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM cand_src a JOIN cand_src b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 4) >= 0.5
"""


# ---------------------------------------------------------------------------
# Real multimodal decode (round-3 VERDICT item 7): binary PPM and PCM WAV
# payloads are SYNTHESIZED in Spark from a closed-form byte/sample recipe,
# decoded FOR REAL by operators/multimodal.decode_ppm / decode_wav (pure
# numpy parsers of the public netpbm/RIFF specs), and the integer-exact
# decode digests (dimensions, sample count, sample sum) are checked against
# a DuckDB oracle that recomputes the same sums from the recipe WITHOUT
# parsing any container — so a single mis-parsed header byte on the Spark
# side breaks the hash.

_N_MEDIA_DOCS = 40


def _media_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .where(F.col("doc_id") < _N_MEDIA_DOCS)
    )


def ppm_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 PPM: w = 4 + d%5, h = 3 + d%4, pixel i = (d*7 + i*13) % 256; a
    ``#`` comment line in the header exercises comment skipping."""
    import pandas as pd

    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_decode_stats,
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 4
                n = w * h * 3
                px = bytes((d * 7 + i * 13) % 256 for i in range(n))
                payload = b"P6\n# gate\n%d %d\n255\n" % (w, h) + px
                rows.append((str(d), "image", payload, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = _media_doc_ids(spark, sf_dir).mapInPandas(synth, schema=MEDIA_SCHEMA)
    return media_decode_stats(media).select(
        "media_id", "format", "width", "height", "n_samples", "sample_sum"
    )


def wav_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit PCM mono WAV: n = 32 + d%17 samples at rate 8000 + (d%5)*1000,
    sample i = ((d*31 + i*17) * 257) % 65536 - 32768 (int16 LE)."""
    import numpy as np
    import pandas as pd

    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_decode_stats,
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 32 + d % 17
                rate = 8000 + (d % 5) * 1000
                i = np.arange(n, dtype=np.int64)
                vals = ((d * 31 + i * 17) * 257) % 65536 - 32768
                data = vals.astype("<i2").tobytes()
                fmt = (
                    (1).to_bytes(2, "little")  # PCM
                    + (1).to_bytes(2, "little")  # mono
                    + rate.to_bytes(4, "little")
                    + (rate * 2).to_bytes(4, "little")  # byte rate
                    + (2).to_bytes(2, "little")  # block align
                    + (16).to_bytes(2, "little")  # bits
                )
                payload = (
                    b"RIFF"
                    + (36 + len(data)).to_bytes(4, "little")
                    + b"WAVE"
                    + b"fmt "
                    + (16).to_bytes(4, "little")
                    + fmt
                    + b"data"
                    + len(data).to_bytes(4, "little")
                    + data
                )
                rows.append((str(d), "audio", payload, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = _media_doc_ids(spark, sf_dir).mapInPandas(synth, schema=MEDIA_SCHEMA)
    return media_decode_stats(media).select(
        "media_id",
        "format",
        "sample_rate",
        "n_channels",
        "n_samples",
        "sample_sum",
    )


def png_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 VERDICT item 3: REAL PNG decode (stdlib zlib + pure-numpy
    unfiltering).  Pixels are closed-form — w = 3 + d%5, h = 5 + d%3
    (h >= 5 so the row-cycling encoder exercises ALL FIVE filter types in
    every payload), channels cycle 1/3/4 (gray, RGB, RGBA) with d%3,
    sample i = (d*11 + i*7) % 256 — encoded with ``encode_png`` on the
    Spark side and decoded back by ``decode_png`` via the standard
    ``media_decode_stats`` path; the DuckDB oracle recomputes width,
    height, channels, and the exact int64 sample sum from the recipe
    WITHOUT touching any container bytes, so one wrong unfilter
    prediction or header byte breaks the hash."""
    import numpy as np
    import pandas as pd

    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        media_decode_stats,
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 3 + d % 5, 5 + d % 3
                ch = (1, 3, 4)[d % 3]
                i = np.arange(w * h * ch, dtype=np.int64)
                px = ((d * 11 + i * 7) % 256).astype(np.uint8)
                rows.append((str(d), "image", encode_png(px, w, h, ch), None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = _media_doc_ids(spark, sf_dir).mapInPandas(synth, schema=MEDIA_SCHEMA)
    return media_decode_stats(media).select(
        "media_id", "format", "width", "height", "n_channels",
        "n_samples", "sample_sum",
    )


PNG_DECODE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_N_MEDIA_DOCS}),
dims AS (SELECT doc_id, 3 + doc_id % 5 AS w, 5 + doc_id % 3 AS h,
                CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS ch
         FROM d),
px AS (SELECT doc_id, w, h, ch, unnest(range(0, w * h * ch)) AS i FROM dims)
SELECT CAST(doc_id AS VARCHAR) AS media_id, 'png' AS format,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(ch AS INTEGER) AS n_channels,
       CAST(w * h * ch AS BIGINT) AS n_samples,
       CAST(sum((doc_id * 11 + i * 7) % 256) AS BIGINT) AS sample_sum
FROM px GROUP BY doc_id, w, h, ch
"""


def jpeg_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 stretch: REAL baseline-JPEG decode (operators/jpeg.py —
    pure-numpy huffman + dequant + IDCT).  JPEG is lossy in general, so
    the closed-form-oracle trick needs the one regime where it is exact:
    BLOCK-CONSTANT grayscale images with unit quantization tables encode
    to a single integer DC coefficient per 8x8 block (all ACs zero) and
    decode back integer-exactly.  Synthesis: w = 16 + 8*(d%3),
    h = 16 + 8*(d%2), block (bx, by) value = (d*13 + (by*(w/8) + bx)*17)
    % 256; the DuckDB oracle recomputes width/height/sample count and
    sample_sum = 64 * sum(block values) without touching any container
    byte — one wrong huffman code, predictor, or IDCT scale breaks the
    hash."""
    import numpy as np
    import pandas as pd

    from baguetter_spark.operators.jpeg import encode_jpeg
    from baguetter_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_decode_stats,
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + 8 * (d % 3), 16 + 8 * (d % 2)
                wb, hb = w // 8, h // 8
                img = np.zeros((h, w), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                            d * 13 + (by * wb + bx) * 17
                        ) % 256
                rows.append(
                    (str(d), "image", encode_jpeg(img.reshape(-1), w, h, 1), None)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = _media_doc_ids(spark, sf_dir).mapInPandas(synth, schema=MEDIA_SCHEMA)
    return media_decode_stats(media).select(
        "media_id", "format", "width", "height", "n_channels",
        "n_samples", "sample_sum",
    )


JPEG_DECODE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_N_MEDIA_DOCS}),
dims AS (SELECT doc_id, 16 + 8 * (doc_id % 3) AS w, 16 + 8 * (doc_id % 2) AS h
         FROM d),
blocks AS (SELECT doc_id, w, h,
                  unnest(range(0, (w // 8) * (h // 8))) AS bi FROM dims)
SELECT CAST(doc_id AS VARCHAR) AS media_id, 'jpeg' AS format,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(w * h AS BIGINT) AS n_samples,
       CAST(64 * sum((doc_id * 13 + bi * 17) % 256) AS BIGINT) AS sample_sum
FROM blocks GROUP BY doc_id, w, h
"""


PPM_DECODE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_N_MEDIA_DOCS}),
dims AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM d),
px AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS i FROM dims)
SELECT CAST(doc_id AS VARCHAR) AS media_id, 'ppm' AS format,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(w * h * 3 AS BIGINT) AS n_samples,
       CAST(sum((doc_id * 7 + i * 13) % 256) AS BIGINT) AS sample_sum
FROM px GROUP BY doc_id, w, h
"""

WAV_DECODE_SQL = f"""
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < {_N_MEDIA_DOCS}),
dims AS (SELECT doc_id, 32 + doc_id % 17 AS n,
                8000 + (doc_id % 5) * 1000 AS rate FROM d),
s AS (SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM dims)
SELECT CAST(doc_id AS VARCHAR) AS media_id, 'wav' AS format,
       CAST(rate AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(sum(((doc_id * 31 + i * 17) * 257) % 65536 - 32768) AS BIGINT) AS sample_sum
FROM s GROUP BY doc_id, n, rate
"""


def gate5_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_minhash_lsh_b2": minhash_b2_query,
        "dedup_ngram_jaccard_5g": ngram_5g_query,
        "multimodal_decode_ppm": ppm_decode_query,
        "multimodal_decode_wav": wav_decode_query,
        "multimodal_decode_png": png_decode_query,
        "multimodal_decode_jpeg": jpeg_decode_query,
    }


def gate5_oracle_sql() -> dict[str, str]:
    return {
        "dedup_minhash_lsh_b2": _minhash_b2_sql(),
        "dedup_ngram_jaccard_5g": NGRAM_5G_SQL,
        "multimodal_decode_ppm": PPM_DECODE_SQL,
        "multimodal_decode_wav": WAV_DECODE_SQL,
        "multimodal_decode_png": PNG_DECODE_SQL,
        "multimodal_decode_jpeg": JPEG_DECODE_SQL,
    }

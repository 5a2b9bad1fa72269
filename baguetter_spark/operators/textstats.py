"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, content
fingerprinting.  All JVM-side column expressions (no Python in the hot
path) over the tokenized documents table — each has a DuckDB-SQL oracle in
gate.py.

These have no reference counterpart (baguetter is a retrieval library); they
are the data-pipeline extensions the 100 TB use case needs, built on the
same tokenization/vocabulary operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baguetter_spark.functions.stopwords import ENGLISH_STOPWORDS

# small function-word lists for the language-ID heuristic (top function words
# per language; public linguistic knowledge)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es": ("el", "la", "los", "las", "es", "que", "con", "para", "una", "por"),
    "fr": ("le", "la", "les", "est", "que", "avec", "pour", "une", "dans", "pas"),
}

FP_MOD = 2147483647  # 2^31 - 1
FP_A = 1000003
FP_B = 7


def tokenize_simple(df: DataFrame, text_col: str = "text") -> DataFrame:
    """lower + whitespace split (the SQL-expressible tokenizer used by the
    gate; the full pipeline lives in functions/preprocess.py)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return df.withColumn("toks", toks)


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len) per document."""
    t = tokenize_simple(docs)
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            F.aggregate(
                "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            ).cast("double")
            / F.greatest(F.size("toks"), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, the
    duplicate-fraction family of training-data filters), per document:

    - ``dup_word_frac``  = (n_words - n_distinct_words) / n_words
    - ``top_bigram_n``   = occurrences of the most frequent word bigram
    - ``top_bigram_frac``= top_bigram_n / n_bigrams

    High values flag boilerplate/spam/keyword-stuffed documents.  Repetition
    is a PER-DOCUMENT property, so everything is higher-order array functions
    on the split column — whole-stage codegen, zero shuffle, no Python: the
    same plan shape at 500 docs and at 10^12.  (The per-distinct-bigram
    count scan is O(unique x total) per doc — bounded by doc length, not by
    corpus size.)"""
    t = tokenize_simple(docs)
    n_words = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    bigrams = F.when(
        n_words >= 2,
        F.zip_with(
            F.slice("toks", 1, n_words - 1),
            F.slice("toks", 2, n_words - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    t = t.withColumn("bg", bigrams)
    n_bigrams = F.size("bg")
    top_n = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct("bg"),
                lambda x: F.size(F.filter("bg", lambda y: y == x)),
            )
        ),
        F.lit(0),
    )
    return t.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct_words"),
        F.when(
            n_words > 0, (n_words - n_distinct).cast("double") / n_words
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        n_bigrams.cast("long").alias("n_bigrams"),
        top_n.cast("long").alias("top_bigram_n"),
        F.when(n_bigrams > 0, top_n.cast("double") / n_bigrams)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style heuristic quality flags + composite score.

    flags: too_short (<5 tokens), too_long (>5000), bad_word_len (mean token
    length outside [2, 12]), low_stopword (stopword ratio < 0.03).
    score = product of passed-flag indicators scaled by a saturating length
    factor least(1, n_tokens/50).
    """
    stop_arr = F.array(*[F.lit(s) for s in sorted(ENGLISH_STOPWORDS)])
    t = tokenize_simple(docs)
    t = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (
            F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
            / F.greatest(F.size("toks"), F.lit(1))
        ).alias("stopword_ratio"),
        (
            F.aggregate("toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast("double")
            / F.greatest(F.size("toks"), F.lit(1))
        ).alias("mean_tok_len"),
    )
    t = t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("stopword_ratio", 4).alias("stopword_ratio"),
        (F.col("n_tokens") < 5).alias("too_short"),
        (F.col("n_tokens") > 5000).alias("too_long"),
        ((F.col("mean_tok_len") < 2) | (F.col("mean_tok_len") > 12)).alias("bad_word_len"),
        (F.col("stopword_ratio") < 0.03).alias("low_stopword"),
    )
    passed = (
        (~F.col("too_short")).cast("int")
        * (~F.col("too_long")).cast("int")
        * (~F.col("bad_word_len")).cast("int")
    )
    return t.withColumn(
        "quality",
        F.round(passed * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(50.0)), 4),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Function-word language-ID heuristic: predicted = argmax over marker-hit
    ratios (ties -> lexicographically first language), 'und' if no marker hits."""
    t = tokenize_simple(docs)

    def _contains(arr):
        return lambda x: F.array_contains(arr, x)

    cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(F.size(F.filter("toks", _contains(arr))).alias(f"hits_{lang}"))
    t = t.select("doc_id", F.size("toks").alias("n_tokens"), *cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:  # lexicographic tie-break: first max wins
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return t.select(
        "doc_id",
        pred.alias("lang_pred"),
        *[F.col(f"hits_{lg}").cast("long").alias(f"hits_{lg}") for lg in langs],
    )


# Unicode block per script (Java/RE2-compatible char-class ranges).  Script
# detection is O(chars) JVM-side and, unlike the function-word heuristic,
# works for languages with no marker list — it is the router that picks a
# stemmer for non-Latin corpora (the registry covers all of these).
SCRIPT_RANGES: dict[str, str] = {
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
    "hangul": "가-힯",
    "latin": "A-Za-zÀ-ÖØ-öø-ÿĀ-ž",  # ASCII + Latin-1 Supplement + Extended-A
    "tamil": "஀-௿",
}

# script -> default stemmer registry name (Latin needs the function-word
# language ID on top; Devanagari defaults to hindi — pass nepali explicitly
# for Nepali corpora)
SCRIPT_STEMMERS: dict[str, str] = {
    "arabic": "arabic",
    "cyrillic": "russian",
    "devanagari": "hindi",
    "greek": "greek",
    "tamil": "tamil",
}


def script_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, script_pred, chars_<script>...).

    Per-script character counts via one regexp_replace each (whole-stage
    codegen, no shuffle — a pure map), argmax with lexicographic
    tie-break, 'und' when no script character occurs."""
    counts = [
        F.length(F.regexp_replace(F.col(text_col), f"[^{rng}]", ""))
        .alias(f"chars_{s}")
        for s, rng in sorted(SCRIPT_RANGES.items())
    ]
    t = docs.select("doc_id", *counts)
    scripts = sorted(SCRIPT_RANGES)
    best = F.greatest(*[F.col(f"chars_{s}") for s in scripts])
    pred = F.when(best <= 0, F.lit("und"))
    for s in scripts:  # lexicographic tie-break: first max wins
        pred = pred.when(F.col(f"chars_{s}") == best, F.lit(s))
    return t.select(
        "doc_id",
        pred.alias("script_pred"),
        *[F.col(f"chars_{s}").cast("long").alias(f"chars_{s}") for s in scripts],
    )


def fingerprint(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Order-sensitive content fingerprint over (position, term_id):
    fp = sum((term_id + 1) * ((FP_A * pos + FP_B) % FP_MOD)) % FP_MOD.
    Pure column math (exact in int64 before each mod) — used as a cheap
    dedup pre-filter key."""
    t = tokenize_simple(docs)
    exploded = t.select("doc_id", F.posexplode("toks").alias("pos", "term"))
    joined = exploded.join(vocab.select("term", "term_id"), "term")
    contrib = (
        (F.col("term_id") + 1)
        * ((F.lit(FP_A) * F.col("pos") + F.lit(FP_B)) % F.lit(FP_MOD))
    ) % F.lit(FP_MOD)
    return joined.groupBy("doc_id").agg(
        (F.sum(contrib) % F.lit(FP_MOD)).alias("fingerprint")
    )

"""Preprocessing unit tests — ports the reference's exact I/O goldens
(reference tests/indices/sparse/text_preprocessor/text_normalization_test.py:7-31,
tokenizer_test.py, stopwords_test.py) plus vectorized/plain parity checks."""

from __future__ import annotations

import pandas as pd
import pytest

from baguetter_spark.config import TextPreprocessorConfig
from baguetter_spark.functions.preprocess import (
    lowercasing,
    make_processor,
    normalize_acronyms,
    normalize_ampersand,
    normalize_special_chars,
    process_series,
    remove_punctuation,
    strip_whitespaces,
)
from baguetter_spark.functions.snowball import stem
from baguetter_spark.functions.stopwords import ENGLISH_STOPWORDS, get_stopwords


class TestReferenceGoldens:
    def test_lowercasing(self):
        assert lowercasing("hEllO") == "hello"

    def test_ampersand(self):
        assert normalize_ampersand("black&sabbath") == "black and sabbath"

    def test_special_chars(self):
        assert normalize_special_chars("‘’") == "''"  # noqa: RUF001
        assert normalize_special_chars("´“”–-") == "'\"\"--"

    def test_acronyms(self):
        assert normalize_acronyms("a.b.c.") == "abc"
        assert normalize_acronyms("foo.bar") == "foo.bar"
        assert normalize_acronyms("a.b@hello.com") == "a.b@hello.com"

    def test_punctuation(self):
        assert remove_punctuation("foo.bar?") == "foo bar "

    def test_strip_whitespaces(self):
        assert strip_whitespaces(" hello   world  ") == "hello world"


class TestPipeline:
    def test_whitespace_parity_config(self):
        proc = make_processor(TextPreprocessorConfig.parity())
        # "brown.fox": '.' followed by "fo" matches the lookahead exception,
        # so the period survives acronym removal and punctuation turns it
        # into a space -> two tokens.
        assert proc("The Quick & Brown.Fox!") == ["the", "quick", "and", "brown", "fox"]
        # "x.y": '.' followed by 'y<end>' — \S[^. ] needs TWO chars, so the
        # period is removed by the acronym rule.
        assert proc("a.b.c. stays x.y") == ["abc", "stays", "xy"]

    def test_empty_and_none(self):
        proc = make_processor(TextPreprocessorConfig.parity())
        assert proc("") == []
        assert proc("   ") == []
        assert proc(None) == []

    def test_stopword_filtering(self):
        proc = make_processor(TextPreprocessorConfig(stemmer=None, stopwords="english"))
        assert proc("the cat and the hat") == ["cat", "hat"]

    def test_full_default_pipeline_runs(self):
        proc = make_processor(TextPreprocessorConfig())
        out = proc("A journey of a thousand miles begins with a single step")
        assert "journey" in out
        assert "mile" in out  # stemmed
        assert "a" not in out  # stopword

    def test_vectorized_matches_plain(self):
        texts = [
            "The quick brown fox jumps over the lazy dog",
            "black&sabbath ‘quoted’ a.b.c. e.g. foo.bar?",  # noqa: RUF001
            "  ",
            "Running flies studies cities ponies",
            "a.b@hello.com & x–y",  # noqa: RUF001
        ]
        for cfg in (
            TextPreprocessorConfig.parity(),
            TextPreprocessorConfig(),
            TextPreprocessorConfig(stemmer=None),
            TextPreprocessorConfig(stopwords=None),
        ):
            proc = make_processor(cfg)
            expected = [proc(t) for t in texts]
            got = process_series(pd.Series(texts), cfg).tolist()
            assert got == expected


class TestStopwords:
    def test_count_matches_nltk(self):
        assert len(ENGLISH_STOPWORDS) == 179

    def test_registry(self):
        assert get_stopwords("english") is ENGLISH_STOPWORDS
        with pytest.raises(ValueError, match="not supported"):
            get_stopwords("klingon")


class TestSnowball:
    @pytest.mark.parametrize(
        ("word", "expected"),
        [
            # published Porter2 sample vocabulary pairs
            ("consign", "consign"),
            ("consigned", "consign"),
            ("consigning", "consign"),
            ("consignment", "consign"),
            ("knack", "knack"),
            ("running", "run"),
            ("flies", "fli"),
            ("dies", "die"),
            ("ties", "tie"),
            ("cries", "cri"),
            ("generate", "generat"),
            ("generates", "generat"),
            ("generated", "generat"),
            ("generating", "generat"),
            ("general", "general"),
            ("generic", "generic"),
            ("generous", "generous"),
            ("communism", "communism"),
            ("skis", "ski"),
            ("skies", "sky"),
            ("dying", "die"),
            ("lying", "lie"),
            ("tying", "tie"),
            ("news", "news"),
            ("inning", "inning"),
            ("proceed", "proceed"),
            ("exceed", "exceed"),
            ("succeed", "succeed"),
            ("happily", "happili"),
            ("nationality", "nation"),
            ("rational", "ration"),
            ("national", "nation"),
            ("conditional", "condit"),
            ("agreed", "agre"),
            ("disabled", "disabl"),
            ("matting", "mat"),
            ("mating", "mate"),
            ("meeting", "meet"),
            ("milling", "mill"),
            ("messing", "mess"),
            ("meetings", "meet"),
            ("miles", "mile"),
            ("journey", "journey"),
            ("cats", "cat"),
            ("by", "by"),
            ("say", "say"),
        ],
    )
    def test_samples(self, word, expected):
        assert stem(word) == expected

    def test_lowercases(self):
        assert stem("Running") == "run"

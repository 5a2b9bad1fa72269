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


# --- round 2: wordpunct tokenizer, diacritics, multi-language stemmers ----


def test_wordpunct_tokenizer():
    """nltk WordPunctTokenizer semantics (regex \\w+|[^\\w\\s]+), reference
    tokenizer.py:15."""
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import make_processor, process_series

    cfg = TextPreprocessorConfig(
        tokenizer="wordpunct", stemmer=None, stopwords=None,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    proc = make_processor(cfg)
    assert proc("Good muffins cost $3.88 in New-York.") == [
        "good", "muffins", "cost", "$", "3", ".", "88", "in", "new", "-", "york", "."
    ]
    import pandas as pd

    vec = process_series(pd.Series(["Good muffins cost $3.88 in New-York."]), cfg)
    assert vec.iloc[0] == proc("Good muffins cost $3.88 in New-York.")


def test_unknown_tokenizer_raises():
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import make_processor

    import pytest as _pytest

    for name in ("punkt", "nope"):
        with _pytest.raises(ValueError, match="not supported"):
            make_processor(TextPreprocessorConfig(tokenizer=name))


# Treebank word tokenizer: goldens are the canonical published examples
# (the $3.88 muffins sentence is the documented nltk example output).
def test_treebank_word_tokenizer_goldens():
    from baguetter_spark.functions.treebank import (
        sent_tokenize,
        treebank_word_tokenize,
        word_tokenize,
    )

    assert word_tokenize(
        "Good muffins cost $3.88 in New York. Please buy me two of them."
    ) == ["Good", "muffins", "cost", "$", "3.88", "in", "New", "York", ".",
          "Please", "buy", "me", "two", "of", "them", "."]
    assert treebank_word_tokenize("They'll save and invest more.") == [
        "They", "'ll", "save", "and", "invest", "more", "."]
    assert treebank_word_tokenize("hi, my name can't hello,") == [
        "hi", ",", "my", "name", "ca", "n't", "hello", ","]
    assert word_tokenize('He said, "I don\'t know."') == [
        "He", "said", ",", "``", "I", "do", "n't", "know", ".", "''"]
    assert treebank_word_tokenize("cannot gonna 'twas") == [
        "can", "not", "gon", "na", "'t", "was"]
    # sentence splitter: abbreviation/initial/acronym guards hold
    assert sent_tokenize(
        "Dr. Smith went to Washington. He arrived at 3 p.m. yesterday."
    ) == ["Dr. Smith went to Washington.", "He arrived at 3 p.m. yesterday."]
    assert sent_tokenize("The U.S. economy grew. Growth was 3.5%.") == [
        "The U.S. economy grew.", "Growth was 3.5%."]
    assert sent_tokenize("") == []
    assert word_tokenize("") == []


def test_multilang_stemmer_routing():
    """Per-document stemmer routing: each row stemmed with its lang's
    registry stemmer; languages with no vendored stemmer (zh) and unknown
    codes pass through unstemmed (never fail, never wrong-language-stem)."""
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import (
        make_processor,
        process_series_multilang,
    )

    cfg = TextPreprocessorConfig(stopwords=None)
    texts = pd.Series([
        "running quickly",
        "die häuser laufen",
        "las casas corrieron",
        "这是中文文本",
        "maisons françaises",
        "unknown language words",
    ])
    langs = pd.Series(["en", "de", "es", "zh", "fr", "xx"])
    out = process_series_multilang(texts, langs, cfg).tolist()
    assert out[0] == ["run", "quick"]
    assert out[1] == ["die", "haus", "lauf"]
    assert out[2] == ["las", "cas", "corr"]
    assert out[3] == ["这是中文文本"]          # no CJK stemmer: unstemmed
    assert out[4] == ["maison", "français"]
    assert out[5] == ["unknown", "language", "words"]  # unknown lang

    # each routed row must equal the single-language pipeline's output
    for i, lang in (("0", "en"), (1, "de"), (2, "es"), (4, "fr")):
        i = int(i)
        proc = make_processor(
            TextPreprocessorConfig(stopwords=None, stemmer=lang)
        )
        assert out[i] == proc(texts[i]), (lang, out[i])

    # null lang -> unstemmed, not an exception
    out2 = process_series_multilang(
        pd.Series(["running"]), pd.Series([None]), cfg
    ).tolist()
    assert out2 == [["running"]]


def test_word_sent_tokenizers_in_pipeline():
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import make_processor, process_series

    # "word": punctuation removal off so Treebank sees the raw sentence
    cfg = TextPreprocessorConfig(
        tokenizer="word", stemmer=None, stopwords=None,
        do_punctuation_removal=False, do_acronyms_normalization=False,
        do_special_chars_normalization=False, do_ampersand_normalization=False,
    )
    proc = make_processor(cfg)
    text = "They'll buy muffins. Costly ones!"
    assert proc(text) == ["they", "'ll", "buy", "muffins", ".",
                          "costly", "ones", "!"]
    vec = process_series(pd.Series([text]), cfg)
    assert vec.iloc[0] == proc(text)

    # "sent": sentences are the tokens
    cfg_s = TextPreprocessorConfig(
        tokenizer="sent", stemmer=None, stopwords=None,
        do_punctuation_removal=False, do_acronyms_normalization=False,
        do_special_chars_normalization=False, do_ampersand_normalization=False,
    )
    assert make_processor(cfg_s)(text) == ["they'll buy muffins.",
                                           "costly ones!"]


def test_diacritics_normalization():
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import make_processor, normalize_diacritics

    assert normalize_diacritics("café naïve Zürich señor œuvre groß") == (
        "cafe naive Zurich senor oeuvre gross"
    )
    cfg = TextPreprocessorConfig(
        stemmer=None, stopwords=None, do_diacritics_normalization=True,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    assert make_processor(cfg)("Café Zürich") == ["cafe", "zurich"]


def test_cyrillic_transliteration():
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import (
        make_processor,
        normalize_diacritics,
    )

    assert normalize_diacritics("Москва") == "Moskva"
    assert normalize_diacritics("щука") == "shchuka"
    assert normalize_diacritics("объём") == "obem"  # hard sign drops, ё→e
    # Russian-convention table: ukr. и→i, ї decomposes to і then i
    assert normalize_diacritics("Київ") == "Kiiv"
    # composed й and decomposed и + breve romanize identically
    assert normalize_diacritics("йод") == normalize_diacritics("йод") == "iod"
    # CJK romanizes too since round 5 (see test_cjk_transliteration)
    assert normalize_diacritics("漢字") == "han zi"
    cfg = TextPreprocessorConfig(
        stemmer=None, stopwords=None, do_diacritics_normalization=True,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    assert make_processor(cfg)("Москва слезам") == ["moskva", "slezam"]


def test_cjk_transliteration():
    """Round-5 T12 closure: CJK ideographs romanize via the vendored
    dominant-reading pinyin table (functions/cjk.py — the Unihan-kMandarin
    convention the reference gets through unidecode, lowercase and
    space-separated here, unknown ideographs passing through)."""
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import (
        make_processor,
        normalize_diacritics,
    )

    # golden pairs, simplified + traditional
    assert normalize_diacritics("中国") == "zhong guo"
    assert normalize_diacritics("我爱北京") == "wo ai bei jing"
    assert normalize_diacritics("機器學習") == "ji qi xue xi"
    assert normalize_diacritics("数据分析") == "shu ju fen xi"
    # dominant readings for common polyphones (kMandarin convention)
    assert normalize_diacritics("长行乐重还都") == "chang xing le zhong hai dou"
    # pinyin separates from adjacent ASCII alphanumerics, not punctuation
    assert normalize_diacritics("Spark引擎x2") == "Spark yin qing x2"
    assert normalize_diacritics("你好, 世界!") == "ni hao, shi jie!"
    # unknown ideograph passes through, separated from neighboring pinyin
    rare = "龥"  # 龥 — last URO codepoint, deliberately untabled
    assert normalize_diacritics(f"中{rare}国") == f"zhong {rare} guo"
    # kanji + kana mix: both passes fire
    assert normalize_diacritics("日本語テキスト") == "ri ben yu tekisuto"
    # NFKD folds compatibility ideographs (U+F900 block) into the URO
    # first, so 郎 (U+F92C -> U+90CE) romanizes like its URO form
    assert normalize_diacritics("郎") == normalize_diacritics("郎") == "lang"
    cfg = TextPreprocessorConfig(
        stemmer=None, stopwords=None, do_diacritics_normalization=True,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    assert make_processor(cfg)("机器学习 rocks") == ["ji", "qi", "xue", "xi", "rocks"]


def test_cjk_table_integrity():
    """The vendored table is duplicate-free (one dominant reading per
    char), URO-only, and every reading is lowercase ASCII pinyin."""
    import re
    from collections import Counter

    from baguetter_spark.functions.cjk import _PINYIN_TO_CHARS, CJK_PINYIN

    counts = Counter(ch for chars in _PINYIN_TO_CHARS.values() for ch in chars)
    dups = {ch: n for ch, n in counts.items() if n > 1}
    assert not dups, dups
    assert len(CJK_PINYIN) == sum(counts.values())
    assert all(0x4E00 <= cp <= 0x9FFF for cp in CJK_PINYIN)
    syllable = re.compile(r"^[a-z]{1,6}$")
    assert all(syllable.match(py) for py in _PINYIN_TO_CHARS)
    assert len(CJK_PINYIN) > 3000  # meaningful coverage, not a token stub


def test_greek_transliteration():
    from baguetter_spark.functions.preprocess import normalize_diacritics

    # ELOT 743 conventions: β→v, η→i, υ→y, φ→f, χ→ch
    assert normalize_diacritics("Ελλάδα") == "Ellada"
    assert normalize_diacritics("ψυχή") == "psychi"
    assert normalize_diacritics("Θεσσαλονίκη") == "Thessaloniki"
    # final sigma ς and medial σ both map to s
    assert normalize_diacritics("λόγος") == "logos"
    # composed ά and decomposed α + combining acute romanize identically
    assert normalize_diacritics("ά") == normalize_diacritics("ά") == "a"


# Hand-traced from the published Snowball specs (snowballstem.org); each
# pair was walked through the algorithm text step by step.
GERMAN_GOLDENS = [
    ("häuser", "haus"),
    ("katzen", "katz"),
    ("bedeutung", "bedeut"),
    ("aufeinander", "aufeinand"),
    ("verständnisse", "verstandnis"),
    ("schönheit", "schonheit"),
    ("arbeiten", "arbeit"),
    ("schönsten", "schon"),
    ("größer", "gross"),
    ("der", "der"),
]

SPANISH_GOLDENS = [
    ("caminando", "camin"),
    ("niñas", "niñ"),
    ("torneos", "torne"),
    ("lógicamente", "logic"),
    ("corriendo", "corr"),
    ("generosidad", "gener"),
    ("hablarlo", "habl"),
    ("la", "la"),
]

FRENCH_GOLDENS = [
    ("continuité", "continu"),
    ("majestueux", "majestu"),
    ("voudriez", "voudr"),
    ("importantes", "import"),
    ("nationaux", "national"),
    ("continua", "continu"),
    ("le", "le"),
]


def test_german_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("german")
    for w, e in GERMAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_spanish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("spanish")
    for w, e in SPANISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_french_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("french")
    for w, e in FRENCH_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_unknown_stemmer_raises():
    import pytest as _pytest

    from baguetter_spark.functions.snowball import get_stemmer

    with _pytest.raises(ValueError, match="not supported"):
        get_stemmer("klingon")


def test_language_id_feeds_stemmer(spark):
    """Language-ID -> per-language stemmer pipeline (VERDICT missing #1):
    route each doc to the stemmer of its predicted language and stem its
    tokens inside one Arrow pass."""
    import pandas as pd

    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import process_series
    from baguetter_spark.functions.snowball import get_stemmer
    from baguetter_spark.operators.textstats import language_id

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the bedeutung is that houses and rivers flow",
                    "der die das und ist nicht mit der bedeutung",
                    "el que la los caminando para con las niñas",
                ],
            }
        )
    )
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert langs == {0: "en", 1: "de", 2: "es"}

    base_cfg = TextPreprocessorConfig(
        stemmer=None, stopwords=None,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    name_of = {"en": "english", "de": "german", "es": "spanish", "fr": "french"}

    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in rows.items():
        st = get_stemmer(name_of[langs[doc_id]])
        toks = process_series(pd.Series([text]), base_cfg).iloc[0]
        stemmed = [st(t) for t in toks]
        assert stemmed  # pipeline runs end to end
    # the German doc's 'bedeutung' stems with the German rules, not English
    de_st = get_stemmer(name_of[langs[1]])
    assert de_st("bedeutung") == "bedeut"


RUSSIAN_GOLDENS = [
    # hand-traced from the snowballstem.org Russian spec (all suffix tests
    # limited to RV, derivational to R2)
    ("книги", "книг"),        # noun и
    ("книгами", "книг"),      # noun ами
    ("делать", "дела"),       # verb ть preceded by а (both in RV)
    ("делалась", "дела"),     # reflexive сь then verb ла
    ("быстрее", "быстр"),     # adjective ее
    ("возможность", "возможн"),  # noun ь then derivational ост in R2
    ("красивее", "красив"),
    ("важная", "важн"),       # adjective ая
    ("бегавшая", "бега"),     # adjectival: ая then participle вш (after а)
    ("стать", "стат"),        # verb ать does NOT fit in RV ('ть'); noun ь applies
]

PORTUGUESE_GOLDENS = [
    ("nacionalidade", "nacional"),   # idade in R2
    ("falando", "fal"),              # verb ando in RV
    ("caminhando", "caminh"),
    ("bonita", "bonit"),             # residual a
    ("geologia", "geolog"),          # logia -> log
    ("quilométricas", "quilométr"),  # icas in R2
    ("felizmente", "feliz"),         # mente in R2
    ("falou", "fal"),                # verb ou
    ("importância", "import"),       # ância in R2
    ("boa", "boa"),                  # too short for any region
]

ITALIAN_GOLDENS = [
    ("abbandonata", "abbandon"),     # verb ata in RV
    ("pericolosa", "pericol"),       # osa in R2
    ("nazionale", "nazional"),       # step-3a final vowel
    ("rapidamente", "rapid"),        # amente in R1
    ("caratteristico", "caratterist"),
    ("mangiarlo", "mang"),           # pronoun lo after ar -> e; verb are; final i
    ("abilità", "abil"),             # ità in R2
    ("dichiarazione", "dichiar"),    # azione in R2
    ("possibilità", "possibil"),
]

DUTCH_GOLDENS = [
    ("bedden", "bed"),               # en + undouble dd
    ("boeken", "boek"),
    ("bakken", "bak"),
    ("lichamelijk", "licham"),       # lijk in R2 then repeat step 2
    ("gelukkig", "gelukk"),          # ig in R2
    ("waterig", "water"),
    ("heerlijkheid", "heerlijk"),    # heid in R2, lijk NOT in R2
    ("boom", "bom"),                 # step-4 vowel undouble
    ("lopen", "lop"),                # en removal meets boom at the same stem
    ("mogelijkheden", "mogelijk"),   # heden -> heid, then heid in R2
    ("appels", "appel"),             # s after valid s-ending
]


SWEDISH_GOLDENS = [
    ("jackor", "jack"),          # or in R1
    ("klubbarna", "klubb"),      # arna in R1
    ("optimisten", "optimist"),  # en in R1
    ("väldigt", "väld"),         # step-2 gt undouble, then ig
    ("följas", "följ"),          # as in R1
    ("stadens", "stad"),         # ens in R1
]

NORWEGIAN_GOLDENS = [
    ("bilene", "bil"),           # ene in R1
    ("huset", "hus"),            # et in R1
    ("kjærligheten", "kjær"),    # heten in R1, then lig in R1
    ("folks", "folk"),           # s after k not preceded by a vowel
    ("boks", "boks"),            # s after k PRECEDED by a vowel: kept
    ("baserte", "baser"),        # erte -> er
]

DANISH_GOLDENS = [
    ("indtagelse", "indtag"),    # e in R1, then els in R1
    ("kaffe", "kaf"),            # e in R1, then undouble ff
    ("vigtigst", "vigt"),        # igst -> ig removal chain
    ("hans", "han"),             # s after valid s-ending
    ("overordnede", "overordned"),  # only residual e strips (no 'ede' in
                                    # the Danish step-1 list, unlike Norwegian)
]


def test_russian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("russian")
    for w, e in RUSSIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_portuguese_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("portuguese")
    for w, e in PORTUGUESE_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_italian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("italian")
    for w, e in ITALIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_dutch_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("dutch")
    for w, e in DUTCH_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_swedish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("swedish")
    for w, e in SWEDISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_norwegian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("norwegian")
    for w, e in NORWEGIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_danish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("danish")
    for w, e in DANISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_new_stemmers_registered_with_aliases():
    from baguetter_spark.functions.snowball import get_stemmer

    for a, b in (("ru", "russian"), ("pt", "portuguese"),
                 ("it", "italian"), ("nl", "dutch"),
                 ("sv", "swedish"), ("no", "norwegian"), ("da", "danish")):
        assert get_stemmer(a) is get_stemmer(b)


# Romanian: hand-traced from the snowballstem.org spec (see snowball_ro.py;
# covers step 0 plural reduction, the "ile not after ab" guard, step 1
# combining-suffix chains, step 2 standard suffixes, step 3 verb endings
# from both groups, step 4 final vowel, and ş/ţ cedilla-vs-comma forms).
ROMANIAN_GOLDENS = [
    ("lucrurilor", "lucrur"),        # step 0 ilor -> i, then final i
    ("copiilor", "cop"),             # step 0 iilor -> i
    ("cartea", "cart"),              # step 0 ea -> e, step 4 e
    ("amabile", "amabil"),           # "ile" NOT stripped after "ab"
    ("contabilitate", "contabil"),   # step 1 abilitate -> abil
    ("administraţiune", "administr"),  # step 1 aţiune -> at, step 2 at
    ("naţionali", "naţional"),       # step 4 residual i
    ("națională", "naţional"),       # comma-below forms normalized
    ("cânta", "cânt"),               # step 4 final a
    ("cântaserăţi", "cânt"),         # step 3 unconditional verb group
    ("lucrează", "lucr"),            # step 3 conditional group (after cons)
    ("românească", "român"),         # step 3 ească
    ("acţiune", "acţiun"),           # short word: ţiune not in R2
]


def test_romanian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("romanian")
    for w, e in ROMANIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ro") is st


# Original Porter (1980): worked examples from the paper, chained through
# the full pipeline (so e.g. relational -> relate (step 2) -> relat
# (step 4)); matches the canonical porter test vocabulary output.
PORTER_GOLDENS = [
    ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("filing", "file"), ("happy", "happi"),
    ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("formaliti", "formal"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("replacement", "replac"), ("adoption", "adopt"),
    ("communism", "commun"), ("activate", "activ"),
    ("effective", "effect"), ("probate", "probat"), ("rate", "rate"),
    ("cease", "ceas"), ("controll", "control"), ("roll", "roll"),
]


def test_porter_original_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("porter")
    for w, e in PORTER_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_porter_differs_from_porter2_where_documented():
    # porter2 (Snowball English) and original porter are different
    # algorithms; spot-check a known divergence so the registry keeping
    # both entries distinct is load-bearing.
    from baguetter_spark.functions.snowball import get_stemmer

    porter = get_stemmer("porter")
    porter2 = get_stemmer("english")
    assert porter is not porter2
    # 'ies' -> 'i' in porter; porter2 maps short -ies to -ie ("ties"->"tie")
    assert porter("ties") == "ti"
    assert porter2("ties") == "tie"


# CISTEM (German): hand-traced from the published algorithm (Weissweiler &
# Fraser 2017, Algorithm 1; see cistem.py).  Covers umlaut/ss folding, the
# ge- prefix strip, sch/ei/ie digraph protection, double-letter protection,
# the title-case -t guard, and the >5 / >3 length regimes.
CISTEM_GOLDENS = [
    ("telefonieren", "telefonier"),   # ie protected; -en -> -e -> stop
    ("häufig", "haufig"),             # umlaut fold only
    ("Universität", "universitat"),   # title case: final -t kept
    ("universität", "universita"),    # lowercase: final -t stripped
    ("schönes", "schon"),             # sch protected; -es stripped
    ("keinen", "kein"),               # ei protected
    ("Affen", "aff"),                 # ff collapses, protected, restored
    ("gelaufen", "lauf"),             # ge- strip (>=4 chars follow)
    ("geh", "geh"),                   # no ge- strip on short words
    ("gegeben", "geb"),               # strips only the FIRST ge-
    ("krankheiten", "krankhei"),      # -en, -t in the lowercase branch
    ("zusammengehörigkeit", "zusammengehorigkei"),
    ("Zusammengehörigkeit", "zusammengehorigkeit"),  # noun keeps -t
]


def test_cistem_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("cistem")
    for w, e in CISTEM_GOLDENS:
        assert st(w) == e, (w, st(w), e)


# Lancaster (Paice/Husk 1990): hand-traced through the published rule
# table (see lancaster.py).  Covers intact-only rules, protect (remove-0)
# rules, append strings, the vowel/consonant acceptability conditions, and
# rule chaining via '>'.
LANCASTER_GOLDENS = [
    ("maximum", "maxim"),        # mu*2. intact rule
    ("presumably", "presum"),    # ylb1> -> lba3> chain
    ("provision", "provid"),     # nois4j> append 'j', then ji1d.
    ("owed", "ow"),              # de2>; vowel-initial 2-letter stem ok
    ("ear", "ear"),              # rae0. protect rule
    ("saying", "say"),           # gni3>; 'y' counts as vowel in stem
    ("crying", "cry"),
    ("string", "string"),        # gni3> rejected: no vowel would remain
    ("meant", "meant"),          # tna3> rejected: 2-letter consonant stem
    ("classified", "class"),     # dei3y> -> yfi3. chain
    ("multiply", "multiply"),    # ylp0. protect rule
    ("cement", "cem"),           # tnem4> rejected, tne3> accepted
    ("kilometer", "kilomet"),    # re2> then no 't' rule matches
    ("news", "new"),             # s0. protect comes after s*1> intact
]


def test_lancaster_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("lancaster")
    for w, e in LANCASTER_GOLDENS:
        assert st(w) == e, (w, st(w), e)


# Finnish: hand-traced from the snowballstem.org spec (see snowball_fi.py;
# covers particles with the n/t/vowel guard, possessives incl. the an/än
# preceded-by lists, case endings (plain, hXn, n+LONG/ie), the i/j vs t
# plural split, and every tidy rule incl. the unrestricted double-consonant
# step e).
FINNISH_GOLDENS = [
    ("edeltäjistään", "edeltäj"),    # än possessive, stä case, i plural
    ("taloissa", "talo"),            # ssa case + i plural
    ("koirissa", "koir"),
    ("koiran", "koira"),             # n case; 'a' kept (no cv before it)
    ("olisiko", "oli"),              # ko particle after vowel, si possessive
    ("nopeasti", "nopeast"),         # sti NOT in R2; tidy b drops final i
    ("järjestelmään", "järjestelm"), # n + LONG undouble, tidy b
    ("ihmisille", "ihmis"),          # lle case + tidy b
    ("presidentti", "president"),    # tidy b + double-consonant e
    ("lapsetkaan", "laps"),          # kaan particle after t, t-plural
    ("aatonaatto", "aatonaato"),     # spec's own step-e example
    ("eläkkeellä", "eläk"),          # llä case, tidy a + e chain
    ("kaikkien", "kaik"),            # n + ie undouble, i plural, step e
    ("voineet", "voine"),            # t plural + tidy a
    ("puhuttaessa", "puhutae"),      # step e behind trailing vowels
    ("suurimman", "suurim"),
]


def test_finnish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("finnish")
    for w, e in FINNISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("fi") is st


# Hungarian: hand-traced from the snowballstem.org spec (see snowball_hu.py;
# covers R1 marking for consonant-initial, vowel-initial and digraph words,
# instrumental al/el with kk undoubling, the frequent-case table with the
# á->a / é->e ending fix, factive é after a double, owned áké/é, singular
# owner, plural owner, and the step 7->9 chains where a stripped case ending
# exposes a possessive a/e and then a plural k — the goldens trace the FULL
# nine-step pipeline, not per-step tables in isolation).
HUNGARIAN_GOLDENS = [
    ("babot", "bab"),          # case ot
    ("házban", "ház"),         # case ban
    ("házakkal", "ház"),       # instrum al + kk undouble, then plural ak
    ("asztalnak", "asztal"),   # sz digraph R1 marking; case nak
    ("gyerekeknek", "gyerek"),  # case nek + plural ek
    ("asszonyok", "asszony"),  # vowel-initial, ss is not a digraph; plural ok
    ("almák", "alma"),         # plural ák -> a (last step, a survives)
    ("almáink", "alma"),       # sing_owner nk, then plur_owner ái -> a
    ("házé", "ház"),           # owned é (factive skipped: z not doubled)
    ("szebbé", "szeb"),        # factive é after bb, undoubled
    ("fákkal", "fák"),         # instrum + undouble; plural ák is OUTSIDE R1
    ("házán", "ház"),          # case n + v_end á->a, then sing_owner a
    ("barátaim", "barát"),     # sing_owner m, then plur_owner ai
    ("kezét", "kez"),          # case t + v_end é->e, then sing_owner e
    ("kezünk", "kez"),         # sing_owner ünk
    ("kések", "kés"),          # plural ek
    ("anyáké", "any"),         # ny digraph R1; owned áké -> a, sing_owner a
    ("munkát", "mun"),         # case t, v_end, sing_owner a, plural k chain
    ("fa", "fa"),              # R1 empty -> untouched
]


def test_hungarian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("hungarian")
    for w, e in HUNGARIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("hu") is st


# Indonesian: hand-traced through the Tala (2003) confix-stripping pipeline
# (see snowball_id.py; covers the measure<=2 guard, particle/possessive
# inflection, every first-order nasal-recovery rule (meny->s, men->t,
# mem->p, meng->delete, the peng family), di/ter/ke/se, the second-order
# ber/bel(ajar)/be+Cer/per/pe rules, the disallowed confix pairs, and the
# full prefix->suffix->second-prefix chains).
INDONESIAN_GOLDENS = [
    ("memilih", "pilih"),          # mem+V -> p+V
    ("menulis", "tulis"),          # men+V -> t+V
    ("menyapu", "sapu"),           # meny+V -> s+V
    ("mengambil", "ambil"),        # meng+V -> delete
    ("membeli", "beli"),           # mem+C -> delete
    ("mencari", "cari"),           # men+C -> delete
    ("melihat", "lihat"),          # me+C -> delete
    ("dikatakannya", "kata"),      # possessive nya, di-, -kan chain
    ("kehidupan", "hidup"),        # ke- then -an (ke-an allowed)
    ("keberhasilan", "hasil"),     # ke- -> -an -> second-order ber-
    ("memberlakukan", "laku"),     # mem- -> -kan -> ber-
    ("berjalan", "jalan"),         # ber-; measure guard stops -an
    ("perjuangan", "juang"),       # second-order per- then -an
    ("belajar", "ajar"),           # bel- only in belajar-type words
    ("bekerja", "kerja"),          # be- before consonant+er
    ("mempunyai", "punya"),        # mem+C keeps p; me–i allowed
    ("sebagainya", "bagai"),       # se-: the se–i disallowed pair fires
    ("sebesar", "besar"),          # se-
    ("terbaik", "baik"),           # ter-
    ("pengukur", "ukur"),          # peng+V -> delete
    ("pemilihan", "pilih"),        # pem+V -> p+V then -an
    ("pembangunan", "bangun"),     # pem+C then -an
    ("duduklah", "duduk"),         # particle lah
    ("bukunya", "buku"),           # possessive nya; measure guard after
    ("makanan", "makan"),          # no prefix; -an
    ("buku", "buku"),              # measure <= 2 -> untouched
]


def test_indonesian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("indonesian")
    for w, e in INDONESIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("id") is st


# Hindi: hand-traced through the Ramanathan & Rao (2003) suffix table (see
# snowball_hi.py; covers all five length groups, the remaining-length
# guard, longest-match precedence, and non-Devanagari passthrough).
HINDI_GOLDENS = [
    ("लड़के", "लड़क"),          # length-1 matra े
    ("लड़कियाँ", "लड़क"),       # length-4 ियाँ
    ("लड़कों", "लड़क"),         # length-2 ों
    ("किताबें", "किताब"),       # length-2 ें
    ("बनाया", "बन"),            # length-3 ाया
    ("खाना", "खा"),             # ाना blocked by length guard; ना fires
    ("करना", "कर"),             # infinitive ना
    ("करते", "कर"),             # participle ते
    ("होती", "हो"),             # participle ती
    ("रहीं", "रह"),             # plural ीं
    ("दिया", "दिय"),            # bare matra ा
    ("का", "का"),               # too short -> untouched
    ("hello", "hello"),         # non-Devanagari passthrough
]


def test_hindi_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("hindi")
    for w, e in HINDI_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("hi") is st


# Turkish: hand-traced through the snowball_tr.py pipeline (Çilden-style
# nominal affix stripping under the morphotactic floor; covers plural,
# possessive, every case, copular chains, vowel harmony rejection, the
# buffer rule, final-consonant restoration, and the documented consistent
# conflations — every member of a paradigm lands on the same stem).
TURKISH_GOLDENS = [
    ("evler", "ev"),                # plural lAr
    ("evlerden", "ev"),             # ablative then plural
    ("evlerinden", "ev"),           # ndan buffer, lArI, full chain
    ("evinde", "ev"),               # locative then 2sg possessive
    ("evimizde", "ev"),             # locative then 1pl possessive
    ("evdeki", "ev"),               # ki then locative
    ("evlerdir", "ev"),             # copular DUr then plural
    ("evi", "ev"),                  # bare harmonic vowel (3sg poss)
    ("kitaplar", "kitap"),          # harmony a->a
    ("kitabı", "kitap"),            # b->p final-consonant restoration
    ("kitabın", "kitap"),           # genitive after consonant
    ("kitapta", "kitap"),           # voiceless locative ta
    ("arabalar", "araba"),          # plural on vowel-final root
    ("arabam", "araba"),            # bare-m possessive after vowel
    ("arabada", "araba"),           # locative attaches with no buffer
    ("arabayı", "araba"),           # y-buffered accusative
    ("arabasını", "araba"),         # accusative nI then 3sg sI
    ("arabasıydı", "araba"),        # copular ydI then sI
    ("araba", "araba"),             # bare dative a/e dropped: root stable
    ("gözlerimin", "göz"),          # genitive(3) -> 1sg poss(2) -> plural
    ("öğretmenim", "öğretmen"),     # floor blocks chain past the poss
    ("öğretmenlerdendi", "öğretmen"),  # copular di -> den -> ler
    ("türkçe", "türk"),             # equative after consonant
    ("gece", "gece"),               # equative blocked after vowel
    ("güzelsin", "güzel"),          # copular sUn
    ("denizlerinde", "deniz"),      # floor keeps -iz on the root
    ("yolunda", "yol"),             # nda buffer then bare u
    ("kapıdan", "kap"),             # consistent conflation: kapı also -> kap
    ("kapı", "kap"),
    ("okullarda", "okul"),
    ("şehirden", "şehir"),
    ("masa", "masa"),               # bare conditional sA dropped
    ("ev", "ev"),
    ("su", "su"),                   # too short to strip
]


def test_turkish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("turkish")
    for w, e in TURKISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("tr") is st


# Arabic: hand-traced through the Light10 inventory (snowball_ar.py —
# normalization, one article/waw prefix, the ordered suffix scan).
ARABIC_GOLDENS = [
    ("الكتاب", "كتاب"),        # al- article
    ("والمكتبة", "مكتب"),      # wal- article; ة normalized then stripped
    ("المعلمون", "معلم"),      # article + masculine plural ون
    ("كتابها", "كتاب"),        # possessive ها
    ("مكتباتها", "مكتب"),      # ها then ات (the scan continues)
    ("وقال", "قال"),           # conjunction و (remainder >= 3)
    ("للطلاب", "طلاب"),        # لل article
    ("بالقلم", "قلم"),         # bal-
    ("وبالقلم", "قلم"),       # wa+bal-: conjunction comes off FIRST
    ("معلمين", "معلم"),        # plural ين
    ("مدرسة", "مدرس"),         # final ة -> ه -> stripped
    ("مستشفى", "مستشف"),       # final ى -> ي -> stripped
    ("أحمد", "احمد"),          # hamza'd alif folded
    ("اب", "اب"),              # too short to strip
    ("hello", "hello"),        # non-Arabic passthrough
]


def test_arabic_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("arabic")
    for w, e in ARABIC_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ar") is st


# Catalan: hand-traced through snowball_ca.py (R1/R2 regions, the
# suf/suf+s longest match, the vowel+ns plural residuals) and checked
# for whole-paradigm convergence.
CATALAN_GOLDENS = [
    ("cantar", "cant"), ("cantava", "cant"), ("cantant", "cant"),
    ("cantades", "cant"), ("cantem", "cant"),
    ("informació", "inform"), ("informacions", "inform"),
    ("nació", "naci"), ("nacions", "naci"),
    ("moviment", "movim"), ("moviments", "movim"),
    ("treballador", "treball"), ("treballadora", "treball"),
    ("treballs", "treball"),
    ("casa", "cas"), ("cases", "cas"),
    ("català", "catal"), ("catalans", "catal"),
    ("camí", "cam"), ("camins", "cam"),
    ("serveix", "serv"), ("servir", "serv"),
    ("possibilitat", "possibil"), ("possibilitats", "possibil"),
]


def test_catalan_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("catalan")
    for w, e in CATALAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ca") is st


# Nepali: hand-traced through snowball_ne.py (postposition pass, plural
# pass, verbal pass — stacked morphology lands on one stem).
NEPALI_GOLDENS = [
    ("किताबहरूको", "किताब"),   # को then हरू
    ("घरमा", "घर"),            # locative clitic मा
    ("गर्छु", "गर्"),           # 1sg present छु
    ("नेपालबाट", "नेपाल"),     # ablative बाट
    ("मानिसहरू", "मानिस"),     # plural only
    ("रामले", "राम"),          # ergative ले
    ("उनीहरूलाई", "उनी"),      # combined हरूलाई
    ("पुस्तकहरुका", "पुस्तक"),  # hrasva-u plural spelling + का
    ("सडकसम्म", "सडक"),        # terminative सम्म
    ("गरेर", "गर"),            # absolutive एर/ेर
    ("घर", "घर"),              # bare stem untouched
    ("hello", "hello"),        # non-Devanagari passthrough
]


def test_nepali_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("nepali")
    for w, e in NEPALI_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ne") is st


# Irish: hand-traced through snowball_ga.py (demutation, fixpoint
# suffix strip, residual genitive vowel).
IRISH_GOLDENS = [
    ("bhfuinneog", "fuinneog"),   # eclipsis bhf -> f
    ("gcarr", "carr"),            # eclipsis gc -> c
    ("nGaeilge".lower(), "gaeilg"),  # ng -> g, then residual e
    ("bhean", "bean"),            # lenition bh -> b
    ("thit", "tit"),              # lenition th -> t
    ("n-athair", "athair"),       # hyphenated pre-vowel n-
    ("tsúil", "súil"),            # ts cluster
    ("ceoltóirí", "ceolt"),       # í plural rides on óir agentive
    ("ceoltóir", "ceolt"),
    ("scoileanna", "scoil"),      # plural anna, residual e
    ("scoile", "scoil"),          # genitive vowel
    ("saoirseacht", "saoirs"),    # abstract eacht
    ("cairdiúil", "caird"),       # adjectival iúil
    ("teach", "teach"),           # no false lenition (te- not lenited)
    ("hello", "hello"),
]


def test_irish_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("irish")
    for w, e in IRISH_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ga") is st


# Lithuanian: hand-traced through snowball_lt.py (fixpoint over the
# declension/conjugation inventory + the -imas nominalizer).
LITHUANIAN_GOLDENS = [
    ("namas", "nam"), ("namo", "nam"), ("namui", "nam"),
    ("namuose", "nam"), ("namams", "nam"),
    ("knyga", "knyg"), ("knygos", "knyg"), ("knygomis", "knyg"),
    ("knygoje", "knyg"),
    ("dirbti", "dirb"), ("dirba", "dirb"), ("dirbo", "dirb"),
    ("dirbdavo", "dirb"),
    ("veikimas", "veik"), ("veikimo", "veik"), ("veikti", "veik"),
    ("mokytojas", "mokytoj"), ("mokytojai", "mokytoj"),
    ("valstybė", "valstyb"), ("valstybės", "valstyb"),
    ("ąžuolas", "ąžuol"), ("ąžuolo", "ąžuol"),
]


def test_lithuanian_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("lithuanian")
    for w, e in LITHUANIAN_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("lt") is st


# Basque: hand-traced through snowball_eu.py (fixpoint over the
# determiner+case endings; stacked gizon+aren+a lands on the stem).
BASQUE_GOLDENS = [
    ("gizona", "gizon"), ("gizonak", "gizon"), ("gizonaren", "gizon"),
    ("gizonarekin", "gizon"), ("gizonei", "gizon"), ("gizonen", "gizon"),
    ("etxea", "etxe"), ("etxean", "etxe"), ("etxeetan", "etxe"),
    ("etxetik", "etxe"), ("etxera", "etxe"), ("etxeko", "etxe"),
    ("hartu", "har"), ("hartzen", "har"), ("hartuko", "har"),
    ("liburua", "liburu"), ("liburuetan", "liburu"),
    ("emakumea", "emakume"), ("emakumeak", "emakume"),
    ("hello", "hello"),
]


def test_basque_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("basque")
    for w, e in BASQUE_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("eu") is st


# Greek: hand-traced through snowball_el.py (final-sigma + accent
# normalization, one longest-match strip).
GREEK_GOLDENS = [
    ("άνθρωπος", "ανθρωπ"), ("ανθρώπου", "ανθρωπ"),
    ("άνθρωποι", "ανθρωπ"), ("ανθρώπων", "ανθρωπ"),
    ("ανθρώπους", "ανθρωπ"),
    ("γυναίκα", "γυναικ"), ("γυναίκες", "γυναικ"), ("γυναικών", "γυναικ"),
    ("παιδί", "παιδ"), ("παιδιά", "παιδ"), ("παιδιών", "παιδ"),
    ("γράφω", "γραφ"), ("γράφεις", "γραφ"), ("γράφουν", "γραφ"),
    ("πόλη", "πολ"), ("πόλεις", "πολ"), ("πόλεων", "πολ"),
    ("έρχονται", "ερχ"), ("έρχομαι", "ερχ"),
    ("hello", "hello"),
]


def test_greek_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("greek")
    for w, e in GREEK_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("el") is st


# Tamil: hand-traced through snowball_ta.py (case/plural/verb strip,
# pulli restoration after vowel-sign endings, the ங்/த்த/ட்ட sandhi
# recodes — every paradigm member lands on the citation form).
TAMIL_GOLDENS = [
    ("மரம்", "மரம்"), ("மரங்கள்", "மரம்"), ("மரத்தில்", "மரம்"),
    ("மரத்தை", "மரம்"),
    ("புத்தகங்கள்", "புத்தகம்"),
    ("செய்கிறேன்", "செய்"), ("செய்தேன்", "செய்"), ("செய்வேன்", "செய்"),
    ("செய்கிறார்கள்", "செய்"),
    ("வீடு", "வீடு"), ("வீடுகள்", "வீடு"), ("வீட்டுக்கு", "வீடு"),
    ("வீட்டில்", "வீடு"),
    ("தமிழ்", "தமிழ்"), ("தமிழில்", "தமிழ்"), ("தமிழால்", "தமிழ்"),
    ("அவன்", "அவன்"), ("அவனை", "அவன்"), ("அவனுக்கு", "அவன்"),
    ("hello", "hello"),
]


def test_tamil_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("tamil")
    for w, e in TAMIL_GOLDENS:
        assert st(w) == e, (w, st(w), e)
    assert get_stemmer("ta") is st


# ---- robustness: every registry stemmer must survive arbitrary tokens ----
# A stemmer exception inside the Arrow tokenize UDF would fail the Spark
# task (and after retries the whole 100 TB build), so totality over weird
# corpus tokens is a production invariant, not a nicety.  Exercise every
# vendored stemmer with adversarial unicode: empty, single chars, combining
# marks, surrogate-adjacent codepoints, digits, huge repeats, and the
# languages' own diacritics in nonsense arrangements.

ALL_REGISTRY_STEMMERS = [
    "english", "german", "french", "spanish", "russian", "portuguese",
    "italian", "dutch", "swedish", "norwegian", "danish", "romanian",
    "finnish", "hungarian", "indonesian", "hindi", "turkish", "arabic",
    "catalan", "nepali", "irish", "lithuanian", "basque", "greek",
    "tamil", "porter", "lancaster", "cistem", "isri", "arlstem",
    "arlstem2",
]


def test_all_registry_stemmers_total_on_adversarial_tokens():
    from baguetter_spark.functions.snowball import get_stemmer

    try:
        from hypothesis import given, settings, strategies as st_
        have_hypothesis = True
    except ImportError:  # pragma: no cover - baked into the sandbox
        have_hypothesis = False

    fixed = [
        "", "a", "á", "é", "ß", "ы", "ъ", "ь", "0", "''", "-", "́",
        "áë", "șț", "şţ", "ŋ" * 50, "aaaaaaaaaaaaaaaaaaaa",
        "ккал", "ção", "öàę", "\t", " ", "é́́",
        "sz" * 40, "ggy", "ssz", "￿", "xyzzy­", "İı",
    ]
    stemmers = [(n, get_stemmer(n)) for n in ALL_REGISTRY_STEMMERS]
    for name, st in stemmers:
        for tok in fixed:
            out = st(tok)
            assert isinstance(out, str), (name, tok, out)

    if have_hypothesis:
        @settings(max_examples=200, deadline=None)
        @given(st_.text(max_size=40))
        def fuzz(tok):
            for name, st in stemmers:
                out = st(tok.lower())
                assert isinstance(out, str), (name, tok)

        fuzz()


# ISRI root extraction: hand-traced through the paper's tables as vendored
# in functions/isri.py (affix strip floors, then the length-4/5/6 pattern
# matchers).  Unlike the light stemmers this one aims at the ROOT.
ISRI_GOLDENS = [
    ("الكتاب", "كتب"),        # ال strip -> length-4 فعال pattern
    ("والمكتبات", "كتب"),     # وال strip, ات strip, مفعل pattern
    ("مدرسون", "درس"),        # ون strip, مفعل pattern
    ("مصانع", "صنع"),         # length-5 مفاعل pattern
    ("استخرج", "خرج"),        # length-6 استفعل pattern
    ("مستشفى", "شفى"),        # length-6 مستفعل pattern
    ("المعلمون", "علم"),      # article + plural + مفعل
    ("كتابهم", "كتب"),        # possessive هم (s2), فعال pattern
    ("كَتَبَ", "كتب"),          # harakat stripped, length-3 returned as-is
    ("hello", "hello"),       # non-Arabic passthrough
    ("", ""),
]


def test_isri_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("isri")
    for w, e in ISRI_GOLDENS:
        assert st(w) == e, (w, st(w), e)


# ARLSTem light stemming: hand-traced through the vendored stage flow
# (functions/arlstem.py — norm, waw, article-or-verb decision, pronoun /
# plural / feminine suffixes).  stem2 adds the bare-particle prefix pass.
ARLSTEM_GOLDENS = [
    ("الكتاب", "كتاب"),       # article only; no root extraction
    ("والمكتبة", "مكتب"),     # waw, article, feminine ة
    ("المعلمون", "معلم"),     # article + sound plural ون
    ("كتابها", "كتاب"),       # possessive ها
    ("مدرسة", "مدرس"),        # feminine ة
    ("بالقلم", "قلم"),        # بال article
    ("وقال", "قال"),          # conjunction و
    ("سيذهب", "ذهب"),         # verb path: future سي prefix
    ("ذهبت", "ذهب"),          # verb path: perfective ت suffix
    ("يكتب", "كتب"),          # verb path: imperfective ي prefix
    ("مستشفى", "مستشف"),      # ى -> ي fold, pronoun-shaped ي strip
    ("أحمد", "حمد"),          # hamza fold; ا taken as verb prefix
    ("hello", "hello"),       # non-Arabic passthrough
    ("", ""),
]


def test_arlstem_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("arlstem")
    for w, e in ARLSTEM_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_arlstem2_particle_prefix():
    """v2 strips a bare particle before the definite article where v1's
    fused inventory cannot reach it (فلل = fa+li+l-), leaves ambiguous
    single leading letters alone (كتاب starts with the particle letter ك),
    and otherwise matches v1."""
    from baguetter_spark.functions.snowball import get_stemmer

    st1 = get_stemmer("arlstem")
    st2 = get_stemmer("arlstem2")
    assert st1("فللكتاب") == "فللكتاب"  # v1: no affix in inventory matches
    assert st2("فللكتاب") == "كتاب"     # v2: particle ف + article لل
    for w, e in ARLSTEM_GOLDENS:
        assert st2(w) == st1(w), (w, st2(w), st1(w))


# Krovetz/KStem: dictionary-less projection (see functions/kstem.py module
# doc — derivational steps are lexicon-gated restore-on-miss in the
# published algorithm, so offline they are identity; the inflectional
# cascade's default branches are implemented).  Goldens hand-traced through
# THOSE rules; rows marked "diverges" differ from lexicon-KStem by design.
KSTEM_GOLDENS = [
    # plural
    ("policies", "policy"), ("queries", "query"), ("ties", "tie"),
    ("dies", "die"), ("classes", "class"), ("boxes", "box"),
    ("tables", "table"), ("indexes", "index"), ("cats", "cat"),
    ("glass", "glass"), ("bus", "bus"), ("basis", "basis"),
    ("was", "was"), ("gas", "gas"),
    # past tense
    ("applied", "apply"), ("died", "die"), ("agreed", "agree"),
    ("feed", "feed"), ("speed", "speed"), ("dropped", "drop"),
    ("hoped", "hope"), ("burned", "burn"), ("called", "call"),
    ("fitted", "fit"), ("fixed", "fix"), ("used", "use"),
    ("passed", "pass"), ("occurred", "occur"), ("embedded", "embed"),
    ("shed", "shed"), ("fled", "fled"), ("stemmed", "stem"),
    # multisyllabic ll undoubles; monosyllabic ll is stable
    ("controlled", "control"), ("cancelled", "cancel"),
    ("travelled", "travel"), ("compelled", "compel"), ("spelled", "spell"),
    # -ceed verbs are their own base: lexeme stays on one index term
    ("exceed", "exceed"), ("exceeded", "exceed"), ("succeeds", "succeed"),
    ("proceeding", "proceed"),
    # aspect
    ("running", "run"), ("falling", "fall"), ("making", "make"),
    ("meeting", "meet"), ("hoping", "hope"), ("singing", "sing"),
    ("sing", "sing"), ("bring", "bring"), ("king", "king"),
    ("visiting", "visit"), ("coming", "come"), ("dying", "die"),
    ("lying", "lie"), ("trying", "try"), ("doing", "do"),
    ("going", "go"), ("searching", "search"), ("indexing", "index"),
    ("stemming", "stem"),
    # derivational endings pass through (lexicon-gated -> identity offline)
    ("ability", "ability"), ("happiness", "happiness"),
    ("nation", "nation"), ("quickly", "quickly"),
    # -zes plurals keep the e (size/prize class); -ches/-shes/-xes/-sses
    # drop -es (catch/dish/box/class class)
    ("sizes", "size"), ("prizes", "prize"), ("catches", "catch"),
    # documented divergences from lexicon-KStem (dictionary-only decisions)
    ("goes", "goe"), ("movies", "movy"), ("fascinating", "fascinat"),
    ("using", "us"), ("added", "ad"), ("installed", "instal"),
    ("caches", "cach"), ("freed", "freed"), ("gassed", "gass"),
    # non-alpha / short tokens pass through
    ("a", "a"), ("red", "red"), ("bm25", "bm25"),
]


def test_krovetz_stemmer_goldens():
    from baguetter_spark.functions.snowball import get_stemmer

    st = get_stemmer("krovetz")
    assert get_stemmer("kstem") is st
    for w, e in KSTEM_GOLDENS:
        assert st(w) == e, (w, st(w), e)


def test_krovetz_registered_in_config():
    """The reference registry's last entry resolves offline (stemmer.py:16)."""
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import make_processor

    cfg = TextPreprocessorConfig(stemmer="krovetz", stopwords=None)
    assert make_processor(cfg)("running dogs dropped policies") == [
        "run", "dog", "drop", "policy",
    ]


def test_arabic_transliteration():
    from baguetter_spark.config import TextPreprocessorConfig
    from baguetter_spark.functions.preprocess import (
        make_processor,
        normalize_diacritics,
    )

    # ALA-LC letters-only conventions (see _ARABIC table): emphatics merge
    # with plain counterparts, ayn/hamza drop, ta marbuta -> h
    assert normalize_diacritics("كتاب") == "ktab"
    assert normalize_diacritics("سلام") == "slam"
    assert normalize_diacritics("القاهرة") == "alqahrh"
    # harakat + shadda are combining marks: stripped before the table, so
    # vocalized and unvocalized spellings romanize identically
    assert normalize_diacritics("مُحَمَّد") == normalize_diacritics("محمد") == "mhmd"
    # presentation-form lam-alef ligature decomposes under NFKD first
    assert normalize_diacritics("ﻻ") == "la"
    # Arabic-Indic and extended digits fold to ASCII
    assert normalize_diacritics("١٢٣ ۴۵") == "123 45"
    # Persian extensions
    assert normalize_diacritics("پچ ژ گ") == "pch zh g"
    cfg = TextPreprocessorConfig(
        stemmer=None, stopwords=None, do_diacritics_normalization=True,
        do_ampersand_normalization=False, do_special_chars_normalization=False,
        do_acronyms_normalization=False, do_punctuation_removal=False,
    )
    assert make_processor(cfg)("كتاب سلام") == ["ktab", "slam"]


def test_devanagari_transliteration():
    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    # contextual inherent-vowel handling (abugida): virama suppresses the
    # "a", matras replace it, word-final schwa deletes
    assert nd("नमस्ते") == "namaste"
    assert nd("दिल्ली") == "dilli"
    assert nd("भारत") == "bharat"
    assert nd("हिंदी") == "hindi"      # anusvara -> n
    assert nd("गंगा") == "ganga"
    assert nd("कृष्ण") == "krishn"     # vocalic r matra -> ri
    assert nd("क्या") == "kya"
    # anusvara is always n (no place assimilation) — documented divergence
    assert nd("मुंबई") == "munbai"
    # nukta loan consonants: precomposed and decomposed forms identical
    import unicodedata as _ud

    composed = "ज़िला"
    decomposed = _ud.normalize("NFD", composed)
    assert nd(composed) == nd(decomposed) == "zila"
    # Devanagari digits fold
    assert nd("०१२") == "012"
    # mixed scripts romanize independently
    assert nd("Hindi हिंदी café Москва") == "Hindi hindi cafe Moskva"


def test_hangul_transliteration():
    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    # Revised Romanization via arithmetic jamo decomposition — exact per
    # syllable; codas use RR's unreleased-stop values
    assert nd("한국") == "hanguk"
    assert nd("서울") == "seoul"
    assert nd("김치") == "gimchi"
    assert nd("안녕하세요") == "annyeonghaseyo"
    assert nd("평양") == "pyeongyang"
    assert nd("삶") == "sam"   # compound coda ㄻ -> m as pronounced
    assert nd("옷") == "ot"    # coda ㅅ -> t (unreleased)


def test_kana_transliteration():
    import unicodedata as _ud

    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    assert nd("すし") == "sushi"
    assert nd("にほん") == "nihon"
    assert nd("とうきょう") == "toukyou"   # long vowels spelled out
    assert nd("がっこう") == "gakkou"      # sokuon doubles the consonant
    assert nd("まっちゃ") == "matcha"      # doubled ch is tch (Hepburn)
    assert nd("じゃぱん") == "japan"       # j keeps its spelling with small ya
    assert nd("しゃしん") == "shashin"     # sh likewise
    assert nd("ラーメン") == "raamen"      # chōonpu repeats the vowel
    assert nd("ニッポン") == "nippon"      # katakana, same rules
    # decomposed dakuten (か + U+3099) recomposes before the map
    assert nd(_ud.normalize("NFD", "がっこう")) == "gakkou"
    # kanji romanizes via the round-5 CJK table alongside the kana pass
    assert nd("日本の すし") == "ri ben no sushi"


def test_indic_parallel_block_transliteration():
    """The eight non-Devanagari Indic blocks are laid out parallel to
    Devanagari (ISCII heritage), so their tables derive by codepoint
    shift + per-script overrides (Tamil ழ/ள/ற/ன, Malayalam chillus,
    Bengali ড়/য়, Gurmukhi tippi, South-Indian short e/o)."""
    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    assert nd("বাংলা") == "banla"          # Bengali
    assert nd("ঢাকা") == "dhaka"
    assert nd("தமிழ்") == "tamizh"         # Tamil (override consonants)
    assert nd("சென்னை") == "chennai"       # short-e matra
    assert nd("తెలుగు") == "telugu"        # Telugu
    assert nd("ಕನ್ನಡ") == "kannad"         # Kannada
    assert nd("ಬೆಂಗಳೂರು") == "bengaluru"
    assert nd("മലയാളം") == "malayalan"     # Malayalam (anusvara -> n)
    assert nd("ഗുജറാത്") != ""             # chillu-free word romanizes
    assert nd("ગુજરાત") == "gujarat"       # Gujarati
    assert nd("ਪੰਜਾਬ") == "panjab"         # Gurmukhi (tippi is a sign)
    assert nd("ଓଡ଼ିଆ") == "oria"           # Oriya (nukta sequence)
    # mixed Indic scripts in one string romanize independently
    assert nd("हिंदी তামিল தமிழ்") == "hindi tamil tamizh"


def test_transliteration_normalization_form_invariance():
    """NFD-ingested text must index the same tokens as NFC (review fix):
    decomposed Hangul is all jamo the block probe can't see, and a
    decomposed two-part Tamil matra would romanize as two wrong vowels."""
    import unicodedata as _ud

    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    for text in ("한국 서울", "கொழி", "দিল্লি", "がっこう"):
        assert nd(_ud.normalize("NFD", text)) == nd(text), text


def test_halfwidth_katakana_folds():
    """Shift-JIS-legacy halfwidth katakana (U+FF66-FF9F) romanizes the
    same as fullwidth, including halfwidth dakuten pairs (review fix)."""
    from baguetter_spark.functions.preprocess import normalize_diacritics as nd

    assert nd("ｶﾀｶﾅ") == nd("カタカナ") == "katakana"
    assert nd("ｶﾞｷﾞ") == "gagi"


# --- punkt golden set (round-3 VERDICT item 6): quantify the sent-splitter
# divergence instead of only documenting it.  Expected outputs transcribed
# from PUBLISHED pretrained-punkt behavior: the nltk.tokenize.punkt module
# doctest (the Mr. Smith / Johann S. Bach example, verbatim) plus canonical
# segmentations every English punkt model produces (abbreviation guards,
# decimal-final sentences, terminator chains, quote-trailing boundaries).
# Match rate is pinned EXACT below; a rule change that breaks a case must
# update the rate knowingly.

PUNKT_GOLDEN = [
    (
        "Punkt knows that the periods in Mr. Smith and Johann S. Bach do not "
        "mark sentence boundaries.  And sometimes sentences can start with "
        "non-capitalized words.  i is a good variable name.",
        [
            "Punkt knows that the periods in Mr. Smith and Johann S. Bach do "
            "not mark sentence boundaries.",
            "And sometimes sentences can start with non-capitalized words.",
            "i is a good variable name.",
        ],
    ),
    ("Hello. How are you? I'm fine!", ["Hello.", "How are you?", "I'm fine!"]),
    (
        "Dr. Brown went to Washington. He arrived at 3 p.m. on Tuesday.",
        ["Dr. Brown went to Washington.", "He arrived at 3 p.m. on Tuesday."],
    ),
    ("The cost was $3.50. It was cheap.", ["The cost was $3.50.", "It was cheap."]),
    (
        "I work for the U.S. government. It is large.",
        ["I work for the U.S. government.", "It is large."],
    ),
    (
        'He said, "Hello there." Then he left.',
        ['He said, "Hello there."', "Then he left."],
    ),
    ("Really?! Yes.", ["Really?!", "Yes."]),
    ("No terminator here", ["No terminator here"]),
    (
        "Prof. Plum saw Mrs. Peacock. They spoke.",
        ["Prof. Plum saw Mrs. Peacock.", "They spoke."],
    ),
    (
        "It was 4.5 meters long. Impressive.",
        ["It was 4.5 meters long.", "Impressive."],
    ),
]


def test_sent_tokenizer_punkt_golden_match_rate():
    """Measured divergence vs pretrained punkt on the vendored golden set.

    Current rate: 10/10 (the decimal-final case was a genuine rule gap,
    fixed in round 4).  Residual divergence risk is confined to punkt's
    corpus-LEARNED abbreviation/collocation statistics, which no fixed
    rule list reproduces — documented in SURVEY §8."""
    from baguetter_spark.functions.treebank import sent_tokenize

    diverged = [
        (text, want, sent_tokenize(text))
        for text, want in PUNKT_GOLDEN
        if sent_tokenize(text) != want
    ]
    rate = 1.0 - len(diverged) / len(PUNKT_GOLDEN)
    assert rate == 1.0, (rate, diverged)

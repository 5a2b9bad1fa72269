"""Text-preprocessing pipeline (reference-parity, Arrow-vectorized).

Reproduces the reference's fixed step order
(`baguetter/indices/sparse/text_preprocessor/text_processor.py:30-81`):

    lowercase -> ampersand -> special-chars -> acronyms -> punctuation
    (-> whitespace-strip iff whitespace tokenizer) -> tokenize -> stopwords
    -> stem -> drop-empty

Step semantics (exact, `.../text_preprocessor/normalization.py`):
  T1 lowercasing        = ``str.lower()``            (normalization.py:20-30)
  T2 ampersand          = ``replace("&", " and ")``  (normalization.py:33-43)
  T3 special chars      = translate ``‘’´“”–-`` -> ``'''""--`` (normalization.py:13,59-69)
  T4 acronyms           = ``re.sub(r"\\.(?!(\\S[^. ])|\\d)", "", t)`` (normalization.py:72-82)
  T5 punctuation        = translate 32 ASCII punct chars -> space (normalization.py:14-17,85-95)
  T6 whitespace strip   = ``" ".join(t.split())`` — subsumed by ``str.split()`` (normalization.py:98-108)
  T7 tokenize           = ``str.split`` (tokenizer.py:12-26; default "whitespace")
  T8 stopword filter    = ``[t for t in toks if t not in stopwords]`` (normalization.py:124-135)
  T9 stem               = ``map(stemmer, toks)`` (normalization.py:138-149)
  T10 drop empty        = ``[t for t in toks if t]`` (normalization.py:152-162)

Two execution surfaces share the same semantics:
- ``make_processor`` — plain-Python ``str -> list[str]`` (oracle / driver side);
- ``process_series`` / ``tokens_udf`` — pandas-vectorized over Arrow batches
  (the engine's hot path; pandas ``.str`` ops are C-level and use Python
  ``re``/``str`` semantics, giving byte parity with the reference where
  Spark SQL functions would not, e.g. Unicode lowercasing and the
  lookahead regex that Java/RE2 handle differently).
"""

from __future__ import annotations

import re
import string
import unicodedata
from collections.abc import Callable
from dataclasses import replace
from typing import Iterator

import pandas as pd

from baguetter_spark.config import TextPreprocessorConfig
from baguetter_spark.functions.snowball import get_stemmer
from baguetter_spark.functions.stopwords import get_stopwords

_SPECIAL_CHARS_TRANS = str.maketrans("‘’´“”–-", "'''\"\"--")  # noqa: RUF001
_PUNCT_TRANS = str.maketrans(string.punctuation, " " * len(string.punctuation))
_ACRONYM_RE = re.compile(r"\.(?!(\S[^. ])|\d)")
# nltk WordPunctTokenizer semantics (reference tokenizer.py:15): runs of
# word chars or runs of non-word non-space chars
_WORDPUNCT_RE = re.compile(r"\w+|[^\w\s]+")

# "wordpunct" is a pure regex; "word" is the published Penn Treebank rule
# cascade over rule-split sentences and "sent" the rule-based sentence
# splitter (functions/treebank.py — sentence boundaries are a documented
# deterministic approximation of nltk's TRAINED punkt model).
_SUPPORTED_TOKENIZERS = ("whitespace", "wordpunct", "word", "sent")


def _tokenize_text(text: str, tokenizer: str) -> list[str]:
    if tokenizer == "whitespace":
        return text.split()
    if tokenizer == "wordpunct":
        return _WORDPUNCT_RE.findall(text)
    from baguetter_spark.functions.treebank import sent_tokenize, word_tokenize

    if tokenizer == "word":
        return word_tokenize(text)
    if tokenizer == "sent":
        return sent_tokenize(text)  # sentences ARE the tokens
    msg = f"no tokenize branch for {tokenizer!r}"  # _resolve validates first
    raise ValueError(msg)

# Latin-script fallbacks NFKD decomposition can't strip (unidecode-style)
_DIACRITIC_EXTRA = str.maketrans(
    {"ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
     "þ": "th", "ł": "l", "ħ": "h", "ı": "i"}
)

# Cyrillic -> Latin romanization (GOST 7.79 System B style, public
# standard; hard/soft signs drop — right for token matching).  Diverges
# from unidecode in detail (unidecode maps ъ/ь to apostrophes); the
# reference's unidecode path is documented as approximated, not cloned.
_CYR_LOWER = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
    # common non-Russian Cyrillic letters (uk/be/sr/bg)
    "і": "i", "ї": "yi", "є": "ye", "ґ": "g", "ђ": "dj", "љ": "lj",
    "њ": "nj", "ћ": "c", "џ": "dz", "ѕ": "dz", "ј": "j",
}
_CYRILLIC = str.maketrans(
    {**_CYR_LOWER, **{k.upper(): v.capitalize() for k, v in _CYR_LOWER.items()}}
)

# Greek -> Latin romanization (ELOT 743 / ISO 843 style, public standard:
# β→v, η→i, υ→y, φ→f, χ→ch).  Accented Greek decomposes under NFKD
# (ά → α + combining acute), so translating the stripped base letters
# covers composed and decomposed input identically, same as Cyrillic.
_GREEK_LOWER = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "i",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}
_GREEK = str.maketrans(
    {**_GREEK_LOWER,
     **{k.upper(): v.capitalize() for k, v in _GREEK_LOWER.items() if k != "ς"}}
)

# Arabic -> Latin romanization (ALA-LC style letters-only, public standard;
# ASCII-folded: emphatics merge with their plain counterparts, ayn/hamza
# drop — right for token matching, same tradeoff as the Cyrillic table).
# Arabic base letters are NOT combining marks so they survive the NFKD
# strip; the short-vowel harakat ARE combining marks and are stripped
# before this table applies (so only consonants + long vowels romanize,
# which matches how the script is actually written).  Presentation-form
# ligatures (ﻻ etc.) decompose under NFKD into these base letters first.
_ARABIC = str.maketrans(
    {"ا": "a", "أ": "a", "إ": "i", "آ": "a", "ء": "", "ؤ": "u", "ئ": "i",
     "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h", "خ": "kh",
     "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s", "ش": "sh",
     "ص": "s", "ض": "d", "ط": "t", "ظ": "z", "ع": "", "غ": "gh",
     "ف": "f", "ق": "q", "ك": "k", "ل": "l", "م": "m", "ن": "n",
     "ه": "h", "ة": "h", "و": "w", "ي": "y", "ى": "a",
     # Persian/Urdu extensions sharing the block
     "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g", "ک": "k", "ی": "y",
     # Arabic-Indic digits (unidecode also folds these)
     "٠": "0", "١": "1", "٢": "2", "٣": "3", "٤": "4", "٥": "5",
     "٦": "6", "٧": "7", "٨": "8", "٩": "9",
     "۰": "0", "۱": "1", "۲": "2", "۳": "3", "۴": "4", "۵": "5",
     "۶": "6", "۷": "7", "۸": "8", "۹": "9"}
)

# Devanagari -> Latin (ISO 15919-style, ASCII-folded).  An abugida cannot
# be romanized by a character map: each consonant carries an inherent "a"
# that is written only when no virama/matra follows, and dropped word-
# finally (Hindi schwa deletion).  So this is a small CONTEXTUAL pass,
# run BEFORE the NFKD strip (matras/anusvara are combining marks and
# would be stripped; nukta consonants must still be composed).
_DEVA_CONSONANTS = {
    "क": "k", "ख": "kh", "ग": "g", "घ": "gh", "ङ": "n",
    "च": "ch", "छ": "chh", "ज": "j", "झ": "jh", "ञ": "n",
    "ट": "t", "ठ": "th", "ड": "d", "ढ": "dh", "ण": "n",
    "त": "t", "थ": "th", "द": "d", "ध": "dh", "न": "n",
    "प": "p", "फ": "ph", "ब": "b", "भ": "bh", "म": "m",
    "य": "y", "र": "r", "ल": "l", "व": "v",
    "श": "sh", "ष": "sh", "स": "s", "ह": "h",
    # nukta (precomposed) Perso-Arabic loan consonants
    "क़": "q", "ख़": "kh", "ग़": "gh", "ज़": "z", "झ़": "zh",
    "ड़": "r", "ढ़": "rh", "फ़": "f", "य़": "y",
}
_DEVA_VOWELS = {  # independent vowels
    "अ": "a", "आ": "a", "इ": "i", "ई": "i", "उ": "u", "ऊ": "u",
    "ऋ": "ri", "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au",
    "ऍ": "e", "ऑ": "o",
    # short e/o (unused in Hindi but their offsets carry the South-Indian
    # blocks' plain e/o: Tamil எ, Telugu ఎ, ...)
    "ऎ": "e", "ऒ": "o",
}
_DEVA_MATRAS = {  # dependent vowel signs (combining)
    "ा": "a", "ि": "i", "ी": "i", "ु": "u", "ू": "u", "ृ": "ri",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au", "ॅ": "e", "ॉ": "o",
    # short e/o matras — carry the South-Indian blocks' plain e/o signs
    "ॆ": "e", "ॊ": "o",
}
_DEVA_SIGNS = {"ं": "n", "ँ": "n", "ः": "h", "ऽ": "", "़": ""}
_DEVA_DIGITS = {chr(0x0966 + i): str(i) for i in range(10)}
_DEVA_VIRAMA = "्"


# decomposed nukta sequences (base consonant + U+093C) — U+0958..095F are
# composition EXCLUSIONS, so NFC does not recompose them; match the
# two-char sequence explicitly
_DEVA_NUKTA_SEQ = {
    k[0] + "़": v
    for k, v in _DEVA_CONSONANTS.items()
    if len(k) == 2 and k[1] == "़"
}
# precomposed U+0958..095F forms decompose to exactly those sequences
_DEVA_CONSONANTS.update({
    chr(cp): _DEVA_NUKTA_SEQ[seq]
    for cp in range(0x0958, 0x0960)
    if (seq := unicodedata.normalize("NFD", chr(cp))) in _DEVA_NUKTA_SEQ
})


# The other eight Indic abugida blocks are laid out PARALLEL to Devanagari
# (ISCII heritage: U+0980 Bengali, U+0A00 Gurmukhi, U+0A80 Gujarati,
# U+0B00 Oriya, U+0B80 Tamil, U+0C00 Telugu, U+0C80 Kannada, U+0D00
# Malayalam — same in-block offset per consonant/vowel/matra/virama), so
# their tables derive from the Devanagari ones by codepoint shift, plus
# small per-script overrides for letters Devanagari lacks (Tamil ழ/ள/ற/ன,
# Malayalam chillus, Bengali ড়/ঢ়/য়, ...).
_INDIC_BLOCK_OVERRIDES: dict[int, dict[str, str]] = {
    0x0900: {},  # Devanagari — the base tables themselves
    0x0980: {"ড়": "r", "ঢ়": "rh", "য়": "y", "ৰ": "r", "ৱ": "v"},
    0x0A00: {"ੜ": "r", "ਸ਼": "sh", "ਖ਼": "kh", "ਗ਼": "gh", "ਜ਼": "z",
             "ਫ਼": "f", "ਲ਼": "l"},
    0x0A80: {"ળ": "l"},
    0x0B00: {"ଳ": "l", "ଡ଼": "r", "ଢ଼": "rh", "ୟ": "y", "ୱ": "w"},
    0x0B80: {"ழ": "zh", "ள": "l", "ற": "r", "ன": "n"},
    0x0C00: {"ళ": "l", "ఱ": "r"},
    0x0C80: {"ಳ": "l", "ಱ": "r"},
    0x0D00: {"ള": "l", "ഴ": "zh", "റ": "r",
             # chillu letters (bare consonants, no inherent vowel risk:
             # they sit outside the consonant table on purpose — mapped
             # as signs so no "a" is appended after them)
             },
}
# bare-consonant signs (no inherent vowel): Malayalam chillus, Bengali
# khanda-ta, Gurmukhi tippi (nasal "n") and addak (dropped, like the
# anusvara convention)
_INDIC_SIGN_OVERRIDES = {"ൺ": "n", "ൻ": "n", "ർ": "r", "ൽ": "l", "ൾ": "l",
                         "ൿ": "k", "ৎ": "t", "ੰ": "n", "ੱ": ""}


def _build_indic_tables() -> tuple:
    cons: dict[str, str] = {}
    vowels: dict[str, str] = {}
    matras: dict[str, str] = {}
    signs: dict[str, str] = {}
    digits: dict[str, str] = {}
    viramas: set[str] = set()
    nuktas: set[str] = set()
    nukta_seq: dict[str, str] = {}
    for base, overrides in _INDIC_BLOCK_OVERRIDES.items():
        shift = base - 0x0900

        def sh(d: dict[str, str]) -> dict[str, str]:
            return {
                chr(ord(k) + shift): v for k, v in d.items() if len(k) == 1
            }

        cons.update(sh(_DEVA_CONSONANTS))
        cons.update(overrides)
        vowels.update(sh(_DEVA_VOWELS))
        matras.update(sh(_DEVA_MATRAS))
        signs.update(sh(_DEVA_SIGNS))
        digits.update(sh(_DEVA_DIGITS))
        viramas.add(chr(0x094D + shift))
        nukta = chr(0x093C + shift)
        nuktas.add(nukta)
        signs[nukta] = ""
        nukta_seq.update({
            chr(ord(k[0]) + shift) + nukta: v for k, v in _DEVA_NUKTA_SEQ.items()
        })
    signs.update(_INDIC_SIGN_OVERRIDES)
    return cons, vowels, matras, signs, digits, viramas, nuktas, nukta_seq


(_INDIC_CONSONANTS, _INDIC_VOWELS, _INDIC_MATRAS, _INDIC_SIGNS,
 _INDIC_DIGITS, _INDIC_VIRAMAS, _INDIC_NUKTAS,
 _INDIC_NUKTA_SEQ) = _build_indic_tables()


_INDIC_RE = re.compile("[\u0900-\u0d7f]")
_HANGUL_RE = re.compile("[\uac00-\ud7a3]")
_KANA_RE = re.compile("[\u3040-\u30ff\uff66-\uff9f]")
# URO + the compatibility-ideograph block (the latter NFKD-normalizes into
# the URO before the CJK pass runs, so the probe must catch both)
_CJK_RE = re.compile("[\u4e00-\u9fff\uf900-\ufaff]")


def _cjk_translit(text: str) -> str:
    """Replace table-known CJK ideographs with toneless-pinyin readings
    (functions/cjk.py; dominant reading per char, the public Unihan
    kMandarin convention the reference gets via unidecode).  Pinyin
    syllables are space-separated from adjacent alphanumeric runs \u2014
    including other ideographs \u2014 so \u4e2d\u56fd -> "zhong guo" tokenizes as two
    words; unknown ideographs pass through unchanged (the documented
    residual instead of unidecode's coverage)."""
    from baguetter_spark.functions.cjk import CJK_PINYIN

    out: list[str] = []
    prev_pinyin = False
    for ch in text:
        py = CJK_PINYIN.get(ord(ch))
        if py is not None:
            if out and out[-1][-1].isalnum():
                out.append(" ")
            out.append(py)
            prev_pinyin = True
        else:
            if prev_pinyin and ch.isalnum():
                out.append(" ")
            out.append(ch)
            prev_pinyin = False
    return "".join(out)


def _indic_translit(text: str) -> str:
    """Contextual Indic-abugida romanization (all nine parallel blocks):
    a consonant gets its inherent "a" only when the next char is neither
    virama, matra, nor a word/run boundary (नमस्ते→namaste, দিল্লি→dilli,
    தமிழ்→tamizh, తెలుగు→telugu).  Anusvara is always "n" (letters-only
    ASCII: no place-of-articulation assimilation, मुंबई→munbai not mumbai
    — documented divergence)."""
    out: list[str] = []
    n = len(text)
    i = 0
    while i < n:
        ch = text[i]
        cons = None
        if i + 1 < n and text[i + 1] in _INDIC_NUKTAS:
            cons = _INDIC_NUKTA_SEQ.get(ch + text[i + 1])
            if cons is not None:
                i += 1  # consume the nukta with its base
        if cons is None:
            cons = _INDIC_CONSONANTS.get(ch)
        if cons is not None:
            out.append(cons)
            nxt = text[i + 1] if i + 1 < n else ""
            if (
                nxt not in _INDIC_MATRAS
                and nxt not in _INDIC_VIRAMAS
                and nxt not in _INDIC_NUKTAS
                and (nxt in _INDIC_CONSONANTS or nxt in _INDIC_VOWELS
                     or nxt in _INDIC_SIGNS or nxt in _INDIC_DIGITS)
            ):
                out.append("a")
            i += 1
            continue
        for table in (_INDIC_VOWELS, _INDIC_MATRAS, _INDIC_SIGNS,
                      _INDIC_DIGITS):
            mapped = table.get(ch)
            if mapped is not None:
                out.append(mapped)
                break
        else:
            if ch not in _INDIC_VIRAMAS:
                out.append(ch)
        i += 1
    return "".join(out)


# Hangul -> Latin (Revised Romanization of Korean, letters-only).  Unlike
# CJK ideographs this is fully ALGORITHMIC: a precomposed syllable in
# U+AC00..D7A3 decomposes arithmetically into (initial, medial, final)
# jamo, each with a fixed RR spelling — so the romanization is exact,
# not approximated (한국→hanguk, 서울→seoul, 김치→gimchi).
_RR_INITIALS = ("g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss",
                "", "j", "jj", "ch", "k", "t", "p", "h")
_RR_MEDIALS = ("a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa",
               "wae", "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui",
               "i")
# codas use RR's pronunciation values (unreleased stops: ㄱ→k, ㄷ→t,
# ㅂ→p; compound codas reduce as pronounced in isolation: ㄺ→k, ㄻ→m,
# ㄼ→l).  Linking across syllables (한국이→hangugi) is contextual
# phonology this per-syllable map does not model — documented.
_RR_FINALS = ("", "k", "k", "k", "n", "n", "n", "t", "l", "k", "m",
              "l", "l", "l", "p", "l", "m", "p", "p", "t", "t",
              "ng", "t", "t", "k", "t", "p", "t")


def _hangul_translit(text: str) -> str:
    out: list[str] = []
    for ch in text:
        cp = ord(ch)
        if 0xAC00 <= cp <= 0xD7A3:
            idx = cp - 0xAC00
            out.append(_RR_INITIALS[idx // 588])
            out.append(_RR_MEDIALS[(idx % 588) // 28])
            out.append(_RR_FINALS[idx % 28])
        else:
            out.append(ch)
    return "".join(out)


# Japanese kana -> Latin (Hepburn-style letters-only).  Kana are a
# syllabary, so a near-character map suffices, with three contextual
# rules: small ya/yu/yo merge with a preceding i-row syllable (きゃ→kya),
# sokuon っ doubles the next consonant (がっこう→gakkou), and the chōonpu
# ー repeats the previous vowel (ラーメン→raamen).  Long vowels stay
# spelled out (とうきょう→toukyou, not tōkyō) — letters-only ASCII.
# Kanji (CJK ideographs) remain the documented pass-through gap.
_KANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "を": "o", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o", "ゔ": "vu",
}
# katakana block is a fixed +0x60 offset from hiragana for the shared rows
_KANA.update({chr(ord(k) + 0x60): v for k, v in list(_KANA.items())})
_KANA_SMALL_Y = {"ゃ": "ya", "ゅ": "yu", "ょ": "yo",
                 "ャ": "ya", "ュ": "yu", "ョ": "yo"}
_KANA_SOKUON = {"っ", "ッ"}
_VOWEL_SET = frozenset("aeiou")


def _kana_translit(text: str) -> str:
    out: list[str] = []
    pending_double = False
    for ch in text:
        if ch in _KANA_SOKUON:
            pending_double = True
            continue
        small = _KANA_SMALL_Y.get(ch)
        if small is not None and out and out[-1].endswith("i"):
            base = out[-1][:-1]
            # sh/ch/j keep their spelling (しゃ→sha, ちゃ→cha, じゃ→ja)
            if base.endswith(("sh", "ch", "j")):
                out[-1] = base + small[1:]
            else:
                out[-1] = base + small
            continue
        if ch == "ー" and out:
            tail = out[-1][-1] if out[-1] else ""
            if tail in _VOWEL_SET:
                out.append(tail)
            continue
        mapped = _KANA.get(ch) or small
        if mapped is None:
            out.append(ch)
            pending_double = False
            continue
        if pending_double and mapped[0] not in _VOWEL_SET:
            # Hepburn: doubled ch is tch (まっちゃ→matcha)
            out.append("t" if mapped.startswith("ch") else mapped[0])
        pending_double = False
        out.append(mapped)
    return "".join(out)


# --- individual steps (exact reference I/O; tested against the reference's
# own goldens, tests/.../text_normalization_test.py:7-31) ---


def lowercasing(text: str) -> str:
    return text.lower()


def normalize_ampersand(text: str) -> str:
    return text.replace("&", " and ")


def normalize_special_chars(text: str) -> str:
    return text.translate(_SPECIAL_CHARS_TRANS)


def normalize_acronyms(text: str) -> str:
    return _ACRONYM_RE.sub("", text)


def remove_punctuation(text: str) -> str:
    return text.translate(_PUNCT_TRANS)


def strip_whitespaces(text: str) -> str:
    return " ".join(text.split())


def normalize_diacritics(text: str) -> str:
    """ASCII-fold diacritics (reference ``normalize_diacritics``,
    normalization.py:46-56, which uses unidecode).  Offline substitute:
    NFKD decomposition + combining-mark strip (exact for Latin diacritics:
    é→e, ü→u, ñ→n), a small table for non-decomposable Latin letters
    (ß→ss, œ→oe, ...), GOST-style Cyrillic romanization (Москва→Moskva),
    ELOT-style Greek romanization (Ελλάδα→Ellada), ALA-LC-style Arabic
    letter romanization (كتاب→ktab, harakat stripped as combining marks),
    a contextual Devanagari pass (नमस्ते→namaste), exact algorithmic
    Hangul Revised Romanization (한국→hanguk), Hepburn-style kana
    (すし→sushi), and a vendored dominant-reading pinyin table for CJK
    ideographs (中国→"zhong guo"; functions/cjk.py, ~3.7k chars, the
    Unihan-kMandarin convention unidecode uses — lowercase and
    space-separated here; ideographs outside the table pass through
    unchanged, the documented residual)."""
    text = text.translate(_DIACRITIC_EXTRA)
    if not text.isascii():
        # NFC first: the contextual passes match composed codepoints
        # (NFD-decomposed Hangul is all jamo the probe cannot see; an
        # NFD two-part Tamil/Bengali matra would romanize as two wrong
        # vowels).  ASCII text skips this on the C-level isascii check.
        text = unicodedata.normalize("NFC", text)
    # C-speed presence probes gate the contextual passes (the passes are
    # Python loops; Latin-only text — the overwhelming common case at
    # corpus scale — must skip them on a single regex scan each)
    if _INDIC_RE.search(text):
        # before the strip: matras/anusvara are combining marks and the
        # inherent-vowel logic needs them (and the virama) in place
        text = _indic_translit(text)
    if _HANGUL_RE.search(text):
        # before the strip: NFD decomposes syllables into jamo, losing the
        # precomposed codepoint the arithmetic decomposition needs
        text = _hangul_translit(text)
    if _KANA_RE.search(text):
        # NFKC: folds halfwidth katakana (U+FF66-FF9F, Shift-JIS legacy
        # data) to the fullwidth block and recomposes decomposed dakuten
        # (か + U+3099 -> が) — both must happen before the map, and the
        # map before NFKD strips the voicing marks
        text = _kana_translit(unicodedata.normalize("NFKC", text))
    text = "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )
    # AFTER the strip: й/ё decompose under NFKD (и+breve / е+diaeresis) and
    # ά/ή likewise, so romanizing the stripped base letters covers composed
    # and decomposed input identically
    text = text.translate(_CYRILLIC).translate(_GREEK).translate(_ARABIC)
    if _CJK_RE.search(text):
        # AFTER the strip too: NFKD folds the compatibility-ideograph
        # block (U+F900-) into URO codepoints the table covers
        text = _cjk_translit(text)
    return text


def _resolve(cfg: TextPreprocessorConfig):
    if cfg.tokenizer not in _SUPPORTED_TOKENIZERS:
        msg = (
            f"Tokenizer {cfg.tokenizer!r} not supported "
            f"(available: {', '.join(_SUPPORTED_TOKENIZERS)})."
        )
        raise ValueError(msg)
    stopword_set: frozenset[str] | None
    if cfg.stopwords is None:
        stopword_set = None
    elif isinstance(cfg.stopwords, str):
        stopword_set = get_stopwords(cfg.stopwords)
    else:
        stopword_set = frozenset(cfg.stopwords) or None
    stemmer = get_stemmer(cfg.stemmer) if cfg.stemmer else None
    return stopword_set, stemmer


def make_processor(cfg: TextPreprocessorConfig | None = None) -> Callable[[str], list[str]]:
    """Build a plain-Python ``text -> tokens`` function with exact reference step order."""
    cfg = cfg or TextPreprocessorConfig()
    stopword_set, stemmer = _resolve(cfg)

    def process(text: str) -> list[str]:
        if text is None:
            return []
        if cfg.do_lowercasing:
            text = text.lower()
        if cfg.do_ampersand_normalization:
            text = text.replace("&", " and ")
        if cfg.do_special_chars_normalization:
            text = text.translate(_SPECIAL_CHARS_TRANS)
        if getattr(cfg, "do_diacritics_normalization", False):
            text = normalize_diacritics(text)
        if cfg.do_acronyms_normalization:
            text = _ACRONYM_RE.sub("", text)
        if cfg.do_punctuation_removal:
            text = text.translate(_PUNCT_TRANS)
            # strip_whitespaces is a no-op under str.split() semantics
        tokens = _tokenize_text(text, cfg.tokenizer)
        if stopword_set is not None:
            tokens = [t for t in tokens if t not in stopword_set]
        if stemmer is not None:
            tokens = [stemmer(t) for t in tokens]
        return [t for t in tokens if t]

    return process


# Worker-global stem caches: token distributions are Zipfian, so memoizing
# stems removes almost all stemmer invocations; the dicts live for the
# lifetime of the (reused) Python worker process, shared across Arrow
# batches.  Keyed by stemmer function — two indices with different stemmer
# languages in the same worker must not share entries.
_STEM_CACHES: dict[object, dict[str, str]] = {}


def _stem_tokens_cached(
    tokens_lists: pd.Series,
    stemmer: Callable[[str], str],
    cache: dict[str, str],
) -> pd.Series:
    def stem_list(toks: list[str]) -> list[str]:
        out = []
        for t in toks:
            s = cache.get(t)
            if s is None:
                s = stemmer(t)
                cache[t] = s
            out.append(s)
        return out

    return tokens_lists.map(stem_list)


def process_series(s: pd.Series, cfg: TextPreprocessorConfig | None = None) -> pd.Series:
    """Vectorized pipeline over a pandas Series of strings -> Series of token lists.

    pandas ``.str`` operations run at C speed but keep Python ``str``/``re``
    semantics, so output is byte-identical to :func:`make_processor`.
    """
    cfg = cfg or TextPreprocessorConfig()
    stopword_set, stemmer = _resolve(cfg)

    s = s.fillna("")
    if cfg.do_lowercasing:
        s = s.str.lower()
    if cfg.do_ampersand_normalization:
        s = s.str.replace("&", " and ", regex=False)
    if cfg.do_special_chars_normalization:
        s = s.str.translate(_SPECIAL_CHARS_TRANS)
    if getattr(cfg, "do_diacritics_normalization", False):
        s = s.map(normalize_diacritics)
    if cfg.do_acronyms_normalization:
        s = s.str.replace(_ACRONYM_RE, "", regex=True)
    if cfg.do_punctuation_removal:
        s = s.str.translate(_PUNCT_TRANS)
    if cfg.tokenizer == "whitespace":
        toks = s.str.split()  # str.split() semantics: any whitespace run, no empties
    elif cfg.tokenizer == "wordpunct":
        toks = s.str.findall(_WORDPUNCT_RE)
    else:  # word / sent: per-row rule pipelines (still Arrow-batched upstream)
        tk = cfg.tokenizer
        toks = s.map(lambda t: _tokenize_text(t, tk))
    if stopword_set is not None:
        sw = stopword_set
        toks = toks.map(lambda ts: [t for t in ts if t not in sw])
    if stemmer is not None:
        toks = _stem_tokens_cached(toks, stemmer, _STEM_CACHES.setdefault(stemmer, {}))
        # stemming can in principle produce empty tokens; T10 drops them
        toks = toks.map(lambda ts: [t for t in ts if t])
    return toks


def tokens_udf(cfg: TextPreprocessorConfig | None = None):
    """A Spark pandas UDF ``string -> array<string>`` running the pipeline.

    Arrow-batched (no per-row Python at the Spark boundary); this is the
    engine's tokenization operator (reference `process_many`,
    text_processor.py:221-259 — its process-pool parallelism is replaced by
    Spark partition parallelism).
    """
    from pyspark.sql.functions import pandas_udf

    cfg = cfg or TextPreprocessorConfig()
    cfg_copy = cfg  # captured by closure; dataclass is picklable

    @pandas_udf("array<string>")
    def _tokenize(batch_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batch_iter:
            yield process_series(s, cfg_copy)

    return _tokenize


# ------------------------------------------------------- multilingual route

# worker-global: lang name -> resolved stemmer fn, or None (unresolvable —
# e.g. "zh": CJK does not stem; unknown codes degrade to no stemming rather
# than failing the 100 TB task or mis-stemming with the wrong language)
_LANG_STEMMERS: dict[str, Callable[[str], str] | None] = {}


def _stemmer_for_lang(lang: str | None) -> Callable[[str], str] | None:
    key = (lang or "").strip().lower()
    if key not in _LANG_STEMMERS:
        try:
            _LANG_STEMMERS[key] = get_stemmer(key) if key else None
        except ValueError:
            _LANG_STEMMERS[key] = None
    return _LANG_STEMMERS[key]


def process_series_multilang(
    texts: pd.Series, langs: pd.Series, cfg: TextPreprocessorConfig | None = None
) -> pd.Series:
    """Per-document stemmer routing for mixed-language corpora.

    Normalization, tokenization and stopwords follow ``cfg`` exactly (note:
    a configured stopword list applies to every row — pass
    ``stopwords=None`` for corpora where English stopwords would be wrong);
    ``cfg.stemmer`` is IGNORED and instead each row is stemmed with the
    registry stemmer named by its ``langs`` value (ISO code or full name —
    the registry accepts both).  Rows whose language has no vendored
    stemmer (e.g. ``zh``) or is null/unknown pass through unstemmed: at
    100 TB degraded-but-correct beats task failure or wrong-language
    stemming.  Pair with :func:`baguetter_spark.operators.textstats.script_id`
    + ``SCRIPT_STEMMERS`` when the corpus has no lang column.
    """
    cfg = cfg or TextPreprocessorConfig()
    base_cfg = replace(cfg, stemmer=None)
    toks = process_series(texts, base_cfg)
    out = toks.copy()
    filled = langs.fillna("")
    for lang in filled.unique():
        stemmer = _stemmer_for_lang(lang)
        if stemmer is None:
            continue
        mask = (filled == lang).to_numpy()
        cache = _STEM_CACHES.setdefault(stemmer, {})
        stemmed = _stem_tokens_cached(toks[mask], stemmer, cache)
        out[mask] = stemmed.map(lambda ts: [t for t in ts if t])  # T10
    return out


def multilang_tokens_udf(cfg: TextPreprocessorConfig | None = None):
    """Spark pandas UDF ``(text string, lang string) -> array<string>``
    running the pipeline with per-row stemmer routing (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    cfg_copy = cfg or TextPreprocessorConfig()

    @pandas_udf("array<string>")
    def _tokenize(
        batch_iter: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        for texts, langs in batch_iter:
            yield process_series_multilang(texts, langs, cfg_copy)

    return _tokenize

"""Vendored pure-Python CISTEM stemmer for German.

The reference registers ``stemmer="cistem"`` via ``nltk.stem.Cistem().stem``
(`baguetter/indices/sparse/text_preprocessor/stemmer.py:21`); implemented
here from the published algorithm (Weissweiler & Fraser 2017, "Developing a
Stemmer for German Based on a Comparative Analysis of Publicly Available
Stemmers", Algorithm 1 — public spec).  Golden pairs in tests are
hand-traced from the spec text.

Algorithm (case-sensitive variant, the reference's default):

1. remember whether the word was title-cased, then lowercase;
2. fold umlauts (ae/oe/ue as single chars) and ss-ligature;
3. strip a leading ``ge-`` when at least 4 chars follow;
4. protect digraphs: ``sch``/``ei``/``ie`` become single sentinel chars,
   doubled letters become ``<char>*``;
5. iteratively strip suffixes while >3 chars remain: ``-em``/``-er`` and
   ``-nd`` only while >5 chars remain; ``-t`` only for words that were NOT
   title-cased (nouns keep their ``-t``); ``-e``/``-s``/``-n`` always;
6. undo the digraph protection.
"""

from __future__ import annotations

import re

_STRIP_GE = re.compile(r"^ge(.{4,})")
_REPL_XX = re.compile(r"(.)\1")
_REPL_XX_BACK = re.compile(r"(.)\*")
_STRIP_EMR = re.compile(r"e[mr]$")
_STRIP_ND = re.compile(r"nd$")
_STRIP_T = re.compile(r"t$")
_STRIP_ESN = re.compile(r"[esn]$")


def _sub(pattern: re.Pattern[str], word: str) -> tuple[str, bool]:
    new = pattern.sub("", word)
    return new, new != word


def stem(word: str, *, case_insensitive: bool = False) -> str:
    if not word:
        return word
    upper = word[0].isupper()
    word = word.lower()
    word = (
        word.replace("ü", "u").replace("ö", "o").replace("ä", "a")
        .replace("ß", "ss")
    )
    word = _STRIP_GE.sub(r"\1", word)
    word = word.replace("sch", "$").replace("ei", "%").replace("ie", "&")
    word = _REPL_XX.sub(r"\1*", word)

    while len(word) > 3:
        if len(word) > 5:
            word, ok = _sub(_STRIP_EMR, word)
            if ok:
                continue
            word, ok = _sub(_STRIP_ND, word)
            if ok:
                continue
        if not upper or case_insensitive:
            word, ok = _sub(_STRIP_T, word)
            if ok:
                continue
        word, ok = _sub(_STRIP_ESN, word)
        if ok:
            continue
        break

    word = _REPL_XX_BACK.sub(r"\1\1", word)
    return word.replace("%", "ei").replace("&", "ie").replace("$", "sch")

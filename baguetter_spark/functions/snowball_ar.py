"""Vendored pure-Python Arabic light stemmer (Light10).

The reference resolves ``stemmer="arabic"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:23`).
The Snowball Arabic algorithm is itself a codification of light stemming;
implemented here as **Light10** (Larkey, Ballesteros & Connell, "Light
stemming for Arabic information retrieval", 2002/2007 — the published
algorithm Lucene's ArabicStemmer also implements).  Golden pairs in tests
are hand-traced from the published prefix/suffix inventory.

Light10 in three passes:

1. normalize — strip tatweel and harakat (diacritics), fold the hamza'd
   alifs (آ أ إ) to bare alif, final alif-maqsura (ى) to ya (ي), and
   final ta-marbuta (ة) to ha (ه);
2. strip the conjunction و first (remainder >= 3 — the stricter floor
   keeps short stems intact; و can precede any other prefix, as in
   وبالقلم = wa+bi+al+qalam), then ONE definite-article prefix from
   {ال وال بال كال فال لل} (remainder >= 2 letters);
3. strip suffixes from {ها ان ات ون ين يه ية ه ة ي}, checked in that
   order and each removable once (the scan continues down the list, so
   e.g. ...يتها loses ها then continues), remainder >= 2 letters.

Non-Arabic tokens pass through unchanged (total on arbitrary unicode —
a stemmer exception inside the tokenize UDF would fail the Spark task).
"""

from __future__ import annotations

_TATWEEL = "ـ"
# harakat / Quranic annotation range used by light10 normalization
_DIACRITICS = frozenset(
    "ًٌٍَُِّْٰٓ"
)

_ALIF_FORMS = {"آ": "ا", "أ": "ا", "إ": "ا"}

_PREFIXES_AL = ("وال", "بال", "كال",
                "فال", "ال", "لل")
_PREFIX_WAW = "و"

_SUFFIXES = (
    "ها",  # ha-alif
    "ان",  # alif-nun
    "ات",  # alif-ta
    "ون",  # waw-nun
    "ين",  # ya-nun
    "يه",  # ya-ha
    "ية",  # ya-ta_marbuta
    "ه",        # ha
    "ة",        # ta_marbuta
    "ي",        # ya
)


def _normalize(word: str) -> str:
    out = []
    for ch in word:
        if ch == _TATWEEL or ch in _DIACRITICS:
            continue
        out.append(_ALIF_FORMS.get(ch, ch))
    if out and out[-1] == "ى":  # final alif maqsura -> ya
        out[-1] = "ي"
    if out and out[-1] == "ة":  # final ta marbuta -> ha
        out[-1] = "ه"
    return "".join(out)


def stem(word: str) -> str:
    w = _normalize(word)
    # Light10 order: the conjunction و comes off FIRST (it can precede any
    # other prefix — وبالقلم is wa+bi+al+qalam), then one article pass
    if w.startswith(_PREFIX_WAW) and len(w) >= 4:
        w = w[1:]
    for p in _PREFIXES_AL:
        if w.startswith(p) and len(w) - len(p) >= 2:
            w = w[len(p):]
            break
    for s in _SUFFIXES:
        if w.endswith(s) and len(w) - len(s) >= 2:
            w = w[: -len(s)]
    return w

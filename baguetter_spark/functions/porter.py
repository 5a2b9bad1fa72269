"""Vendored pure-Python original Porter (1980) stemmer.

The reference registers ``stemmer="porter"`` via ``nltk.stem.PorterStemmer``
(`baguetter/indices/sparse/text_preprocessor/stemmer.py:17`); implemented
here from the published algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980 — the same public spec snowballstem.org
hosts as "The Porter stemming algorithm").  Golden pairs in tests are the
worked examples printed in the paper itself.

Fidelity note: this is the ORIGINAL published algorithm.  NLTK's default
``PorterStemmer`` mode (NLTK_EXTENSIONS) adds a handful of departures
(e.g. special-casing a small irregular list); the official porter.c also
added two later amendments (``(m>0) bli -> ble`` generalized from ``abli``,
and ``logi -> log``).  Those departures are intentionally NOT applied —
``porter2``/``english`` (Snowball) is the modern default; ``porter`` exists
for reference-registry parity on the classic algorithm.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: number of vowel->consonant transitions."""
    m = 0
    prev_cons = None
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if prev_cons is False and cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(stem) < 3:
        return False
    return (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _replace_m(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, replace."""
    if not word.endswith(suffix):
        return None
    stem = word[: -len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # matched but condition failed: stop scanning (longest match)


def _step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-2]
    if word.endswith("ss"):
        return word
    if word.endswith("s"):
        return word[:-1]
    return word


def _step1b(word: str) -> str:
    if word.endswith("eed"):
        stem = word[:-3]
        return stem + "ee" if _measure(stem) > 0 else word
    removed = None
    if word.endswith("ed") and _has_vowel(word[:-2]):
        removed = word[:-2]
    elif word.endswith("ing") and _has_vowel(word[:-3]):
        removed = word[:-3]
    if removed is None:
        return word
    w = removed
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _ends_cvc(w):
        return w + "e"
    return w


def _step1c(word: str) -> str:
    if word.endswith("y") and _has_vowel(word[:-1]):
        return word[:-1] + "i"
    return word


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou",
)


def _map_step(word: str, rules, min_m: int) -> str:
    for suf, rep in sorted(rules, key=lambda r: -len(r[0])):
        if word.endswith(suf):
            out = _replace_m(word, suf, rep, min_m)
            return out if out is not None else word
    return word


def _step4(word: str) -> str:
    for suf in sorted(_STEP4, key=len, reverse=True):
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and stem[-1:] not in ("s", "t"):
                    return word
                return stem
            return word
    return word


def _step5(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            word = stem
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        word = word[:-1]
    return word


def stem(word: str) -> str:
    """Stem one lowercase English word with the original 1980 algorithm.
    Words of length 1-2 are returned unchanged (per the paper)."""
    if len(word) <= 2:
        return word
    word = _step1a(word)
    word = _step1b(word)
    word = _step1c(word)
    word = _map_step(word, _STEP2, 0)
    word = _map_step(word, _STEP3, 0)
    word = _step4(word)
    word = _step5(word)
    return word

"""Vendored pure-Python Dutch Snowball stemmer.

The reference resolves ``stemmer="dutch"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:37`);
implemented here from the published algorithm (snowballstem.org "The
Dutch stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

Preliminaries per the spec: umlauts and acutes are mapped away (``è``
stays); initial ``y``, ``y`` after a vowel and ``i`` between vowels are
marked as non-vowels (uppercased internally, lowered at the end); R1 is
adjusted so at least 3 letters precede it.
"""

from __future__ import annotations

_VOWELS = "aeiouyè"

_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _mark(word: str) -> str:
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    for i in range(1, len(chars) - 1):
        if chars[i] == "i" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "I"
    return "".join(chars)


def _regions(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, 3) if r1 < n else r1  # >= 3 letters before R1
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _in(word: str, suffix: str, region: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= region


def _undouble(word: str) -> str:
    for d in ("kk", "dd", "tt"):
        if word.endswith(d):
            return word[:-1]
    return word


def _valid_en_stem(stem_part: str) -> bool:
    return (
        bool(stem_part)
        and stem_part[-1] not in _VOWELS
        and not stem_part.endswith("gem")
    )


def _try_en(word: str, r1: int) -> str:
    """Step-1(b) en/ene removal, reused by step 3a."""
    for s in ("ene", "en"):
        if _in(word, s, r1) and _valid_en_stem(word[: len(word) - len(s)]):
            return _undouble(word[: len(word) - len(s)])
    return word


def _step2(word: str, r1: int) -> tuple[str, bool]:
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _VOWELS
    ):
        return _undouble(word[:-1]), True
    return word, False


def stem(word: str) -> str:
    word = word.translate(_FOLD)
    word = _mark(word)
    r1, r2 = _regions(word)

    # Step 1: longest of heden / en(e) / s(e)
    if _in(word, "heden", r1):
        word = word[:-5] + "heid"
    else:
        pre = word
        word = _try_en(word, r1)
        if word == pre:
            for s in ("se", "s"):
                if (
                    _in(word, s, r1)
                    and len(word) > len(s)
                    and word[-len(s) - 1] not in _VOWELS + "j"
                ):
                    word = word[: len(word) - len(s)]
                    break

    word, e_found = _step2(word, r1)

    # Step 3a: heid
    if _in(word, "heid", r2) and not word.endswith("cheid"):
        word = word[:-4]
        word = _try_en(word, r1)

    # Step 3b: d-suffixes (longest match)
    best = None
    for s in ("baar", "lijk", "end", "ing", "bar", "ig"):
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best in ("end", "ing") and _in(word, best, r2):
        word = word[:-3]
        if _in(word, "ig", r2) and not word.endswith("eig"):
            word = word[:-2]
        else:
            word = _undouble(word)
    elif best == "ig" and _in(word, "ig", r2) and not word.endswith("eig"):
        word = word[:-2]
    elif best == "lijk" and _in(word, "lijk", r2):
        word = word[:-4]
        word, _ = _step2(word, r1)
    elif best == "baar" and _in(word, "baar", r2):
        word = word[:-4]
    elif best == "bar" and e_found and _in(word, "bar", r2):
        word = word[:-3]

    # Step 4: undouble vowel — CVD, V in {aa, ee, oo, uu}, D not I
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _VOWELS
            and d not in _VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            word = word[:-2] + word[-1]

    return word.lower()

"""Vendored pure-Python German Snowball stemmer.

The reference resolves ``stemmer="german"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:40`);
neither PyStemmer nor NLTK is installable offline, so this implements the
published algorithm (snowballstem.org "The German stemming algorithm",
public spec) from scratch.  Golden pairs in tests are hand-traced from the
spec text.
"""

from __future__ import annotations

_VOWELS = "aeiouyäöü"
_S_ENDINGS = "bdfghklmnrt"
_ST_ENDINGS = "bdfghklmnt"


def _regions(word: str) -> tuple[int, int]:
    """Standard R1/R2 over the marked word; R1 then adjusted so the region
    before it has at least 3 letters (spec amendment)."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    if r1 < 3:
        r1 = 3
    return r1, r2


def stem(word: str) -> str:
    """Stem one word with the German Snowball algorithm (lowercases input)."""
    word = word.lower().replace("ß", "ss")
    if len(word) < 2:
        return word

    # mark u and y between vowels as consonants (progressive scan)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 1: longest of (a) em (b) ern er (c) e en es (d) s (valid s-ending)
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if word.endswith(suf):
            if suf == "s":
                if (
                    len(word) >= 2
                    and word[-2] in _S_ENDINGS
                    and len(word) - 1 >= r1
                ):
                    word = word[:-1]
            elif len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                if suf in ("e", "en", "es") and word.endswith("niss"):
                    word = word[:-1]
            break

    # Step 2: longest of (a) en er est (b) st (valid st-ending, itself
    # preceded by at least 3 letters)
    for suf in ("est", "en", "er", "st"):
        if word.endswith(suf):
            if suf == "st":
                if (
                    len(word) >= 6
                    and word[-3] in _ST_ENDINGS
                    and len(word) - 2 >= r1
                ):
                    word = word[:-2]
            elif len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
            break

    # Step 3: d-suffixes
    for suf in ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik"):
        if word.endswith(suf):
            base = len(word) - len(suf)
            if suf in ("end", "ung"):
                if base >= r2:
                    word = word[:-len(suf)]
                    if (
                        word.endswith("ig")
                        and len(word) - 2 >= r2
                        and (len(word) < 3 or word[-3] != "e")
                    ):
                        word = word[:-2]
            elif suf in ("ig", "ik", "isch"):
                if base >= r2 and (base == 0 or word[base - 1] != "e"):
                    word = word[:-len(suf)]
            elif suf in ("lich", "heit"):
                if base >= r2:
                    word = word[:-len(suf)]
                    for pre in ("er", "en"):
                        if word.endswith(pre) and len(word) - 2 >= r1:
                            word = word[:-2]
                            break
            else:  # keit
                if base >= r2:
                    word = word[:-len(suf)]
                    for pre in ("lich", "ig"):
                        if word.endswith(pre) and len(word) - len(pre) >= r2:
                            word = word[: -len(pre)]
                            break
            break

    # Finally: unmark U/Y, strip umlauts
    return (
        word.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )

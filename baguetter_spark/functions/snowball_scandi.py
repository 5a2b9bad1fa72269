"""Vendored pure-Python Swedish, Norwegian and Danish Snowball stemmers.

The reference resolves ``stemmer="swedish" / "norwegian" / "danish"`` to
PyStemmer's Snowball C implementations (`baguetter/indices/sparse/
text_preprocessor/stemmer.py:15-48`); PyStemmer is not installable
offline, so these are implemented from the published algorithms
(snowballstem.org "The Swedish / Norwegian / Danish stemming
algorithms", public specs).  Golden pairs in tests are hand-traced from
the spec texts.

The three algorithms share one skeleton: R1 (adjusted so at least 3
letters precede it), a longest-suffix step-1 with an s-ending letter
class, a consonant-pair step 2, and a small step 3; Danish adds a final
undouble.  Suffix matching is limited to R1 (Snowball ``setlimit tomark
p1``): a longer suffix that starts before R1 does NOT shadow a shorter
one inside R1.
"""

from __future__ import annotations


def _r1_min3(word: str, vowels: str) -> int:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return min(max(r1, 3), n) if r1 < n else r1


def _longest_in_r1(word: str, r1: int, suffixes: tuple[str, ...]) -> str | None:
    """Longest suffix that lies entirely within R1 (suffixes pre-sorted
    longest-first).  A longer out-of-region match is skipped, not a stop —
    equivalent to matching against the R1 substring."""
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= r1:
            return s
    return None


def _bylen(*suffixes: str) -> tuple[str, ...]:
    return tuple(sorted(suffixes, key=len, reverse=True))


# --------------------------------------------------------------------------
# Swedish
_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = _bylen(
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande", "arne",
    "are", "aste", "en", "anden", "aren", "heten", "ern", "ar", "er", "heter",
    "or", "as", "arnas", "ernas", "ornas", "es", "ades", "andes", "ens",
    "arens", "hetens", "erns", "at", "andet", "het", "ast", "s",
)
_SV_S_ENDING = "bcdfghjklmnoprtvy"
_SV_STEP2 = _bylen("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = _bylen("fullt", "löst", "lig", "els", "ig")


def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1_min3(word, _SV_VOWELS)
    s = _longest_in_r1(word, r1, _SV_STEP1)
    if s == "s":
        if len(word) >= 2 and word[-2] in _SV_S_ENDING:
            word = word[:-1]
    elif s:
        word = word[: -len(s)]
    if _longest_in_r1(word, r1, _SV_STEP2):
        word = word[:-1]
    s = _longest_in_r1(word, r1, _SV_STEP3)
    if s in ("fullt", "löst"):
        word = word[:-1]  # fullt -> full, löst -> lös
    elif s:
        word = word[: -len(s)]
    return word


# --------------------------------------------------------------------------
# Norwegian
_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = _bylen(
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast", "ert", "erte", "s",
)
_NO_S_ENDING = "bcdfghjlmnoprtvyz"  # plus: k not preceded by a vowel
_NO_STEP2 = _bylen("dt", "vt")
_NO_STEP3 = _bylen(
    "hetslov", "slov", "elov", "lov", "elig", "eleg", "leg", "els", "lig",
    "eig", "ig",
)


def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1_min3(word, _NO_VOWELS)
    s = _longest_in_r1(word, r1, _NO_STEP1)
    if s in ("erte", "ert"):
        word = word[: -len(s)] + "er"
    elif s == "s":
        ok = (len(word) >= 2 and word[-2] in _NO_S_ENDING) or (
            len(word) >= 3 and word[-2] == "k" and word[-3] not in _NO_VOWELS
        )
        if ok:
            word = word[:-1]
    elif s:
        word = word[: -len(s)]
    if _longest_in_r1(word, r1, _NO_STEP2):
        word = word[:-1]
    s = _longest_in_r1(word, r1, _NO_STEP3)
    if s:
        word = word[: -len(s)]
    return word


# --------------------------------------------------------------------------
# Danish
_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = _bylen(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret", "s",
)
_DA_S_ENDING = "abcdfghjklmnoprtvyzå"
_DA_STEP2 = _bylen("gd", "dt", "gt", "kt")
_DA_STEP3 = _bylen("elig", "løst", "lig", "els", "ig")


def _da_step2(word: str, r1: int) -> str:
    if _longest_in_r1(word, r1, _DA_STEP2):
        return word[:-1]
    return word


def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1_min3(word, _DA_VOWELS)
    s = _longest_in_r1(word, r1, _DA_STEP1)
    if s == "s":
        if len(word) >= 2 and word[-2] in _DA_S_ENDING:
            word = word[:-1]
    elif s:
        word = word[: -len(s)]
    word = _da_step2(word, r1)
    if word.endswith("igst"):
        word = word[:-2]
    s = _longest_in_r1(word, r1, _DA_STEP3)
    if s == "løst":
        word = word[:-1]
    elif s:
        word = word[: -len(s)]
        word = _da_step2(word, r1)  # spec: "delete, and then repeat step 2"
    # undouble: final double consonant with the last letter in R1
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] not in _DA_VOWELS
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word

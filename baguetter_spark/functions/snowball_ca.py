"""Vendored pure-Python Catalan stemmer.

The reference resolves ``stemmer="catalan"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:25`).
Implemented here following the published Snowball Catalan algorithm's
step structure (snowballstem.org, contributed algorithm: attached
pronouns, then standard/derivational suffixes in R1/R2, then verb
endings in R1, then a residual vowel/plural step), with the suffix
inventory restricted to the high-frequency subset of the spec's lists —
the productive nominal derivations, the full regular verb paradigms of
the three conjugations (including the -eix- inchoative), and the
plural/residual endings.  Goldens in tests/test_preprocess.py are
hand-traced through these tables and checked for whole-paradigm
convergence (cantar/cantava/cantant/cantada → cant,
informació/informacions → informaci, ...).

Catalan uses R1/R2 only (no RV).  Diacritics are preserved during region
matching and folded at the end (à/á→a, è/é→e, í/ï→i, ò/ó→o, ú/ü→u), as
the published algorithm's cleaning step does.
"""

from __future__ import annotations

_VOWELS = "aeiouàáèéíïòóúü"

_ACCENT_MAP = str.maketrans(
    {"à": "a", "á": "a", "è": "e", "é": "e", "í": "i", "ï": "i",
     "ò": "o", "ó": "o", "ú": "u", "ü": "u"}
)

# step 0: attached pronouns (enclitics, hyphen/apostrophe already removed
# by the preprocessor's punctuation strip, so both bare and marked forms)
_PRONOUNS = (
    "-nos", "-vos", "'ns-e", "-les", "-los", "-la", "-lo", "-li", "-me",
    "-te", "-se", "-ho", "-hi", "-ne", "'ls", "'ns", "'m", "'t", "'s",
    "'l", "nos", "vos", "los",
)

# step 1: derivational suffixes deleted in R2 (longest match)
_DERIV_R2 = (
    "acions", "ació", "icions", "ició", "ments", "ment", "ables", "able",
    "ibles", "ible", "ismes", "isme", "istes", "ista", "itats", "itat",
    "dores", "dora", "dors", "dor", "ances", "ança", "ències", "ència",
    "oses", "osos", "osa", "ós", "ives", "iva", "ius", "iu", "eses",
    "esa", "atges", "atge", "eries", "eria",
)

# step 2: verb endings deleted in R1 (longest match) — the regular
# paradigms: infinitive/gerund/participle, imperfect, future/conditional,
# present incl. the -eix- inchoative, preterite and subjunctive cores
_VERB_R1 = (
    "aríem", "aríeu", "arien", "aries", "íssiu", "íssim", "issin",
    "èssiu", "èssim", "essin", "eixes", "eixen", "eixo", "aria", "aràs",
    "arem", "areu", "aran", "arà", "aré", "iràs", "irem", "ireu", "iran",
    "irà", "iré", "iria", "àvem", "àveu", "aven", "aves", "ava", "íem",
    "íeu", "ien", "ies", "ia", "eix", "ant", "ent", "int", "ades", "ada",
    "ats", "at", "udes", "uda", "uts", "ut", "ides", "ida", "its", "it",
    "ar", "er", "ir", "re", "em", "eu", "en", "es",
)

# step 3: residual plural/vowel in R1.  The vowel+ns forms are the
# regular plurals of stressed-vowel-final words (nació→nacions,
# català→catalans, camí→camins) — stripping them keeps singular and
# plural on the same stem.
_RESIDUAL = ("ons", "ans", "ins", "uns", "os", "a", "o", "e", "à", "é",
             "è", "í", "ó", "ò", "s")


def _regions(word: str) -> tuple[int, int]:
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
    return r1, r2


def _strip(word: str, suffixes: tuple[str, ...], region: int) -> str:
    """Longest match over suffixes AND their +s plurals, region-guarded —
    matching suf/suf+s together keeps singular and plural on one stem
    (moviment and moviments both lose 'ment(s)')."""
    best = ""
    for suf in suffixes:
        for cand in (suf, suf + "s"):
            if (len(cand) > len(best) and word.endswith(cand)
                    and len(word) - len(cand) >= region):
                best = cand
    return word[: -len(best)] if best else word


def stem(word: str) -> str:
    """Stem one word with the Catalan algorithm (lowercases input)."""
    word = word.lower()
    if len(word) < 3:
        return word.translate(_ACCENT_MAP)
    r1, r2 = _regions(word)

    for pron in _PRONOUNS:
        if word.endswith(pron) and len(word) - len(pron) >= r1:
            word = word[: -len(pron)]
            break

    w = _strip(word, _DERIV_R2, r2)
    if w == word:
        w = _strip(word, _VERB_R1, r1)
    word = _strip(w, _RESIDUAL, r1)

    return word.translate(_ACCENT_MAP)

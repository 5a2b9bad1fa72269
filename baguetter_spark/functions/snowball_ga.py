"""Vendored pure-Python Irish stemmer.

The reference resolves ``stemmer="irish"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:36`).
Implemented here following the published Snowball Irish algorithm's step
structure (snowballstem.org, contributed algorithm): undo the initial
mutations first (they are grammatical, not lexical — an eclipsed or
lenited form is the SAME lexeme), then strip the productive noun /
adjective / verb suffixes with a region guard.  The suffix inventory is
the high-frequency subset of the spec's lists.  Goldens in
tests/test_preprocess.py are hand-traced (bhfuinneog→fuinneog,
gcarr→carr, ceolteoirí→ceolteoir? no — ceoltóirí→ceoltóir, ...).

Initial mutations:

- pre-vowel prefixes written with a hyphen (n-, h-, t-) and their
  bare forms before a vowel (na-/ha-/ta- shapes): ``n-athair→athair``,
  ``ts``+vowel and ``t``+vowel handled by the ts cluster rule;
- eclipsis clusters: mb→b, gc→c, nd→d, bhf→f, bp→b, dt→d, ng→g, ts→t;
- lenition: initial consonant + h (bh ch dh fh gh mh ph sh th) loses
  the h when a vowel or r/l/n follows (``bhean→bean``, ``fhuinneog→
  fuinneog`` — with fh the f is silent but restoring f keeps the
  lexeme's citation form).

Suffixes (longest match, >= 3 codepoints of stem must remain): plural /
genitive ``-anna -acha -ta -te -aí -í``, abstract ``-(e)acht``,
adjectival ``-(i)úil -mhar``, agentive ``-(e)oir -éir -óir``, verbal
``-(e)adh -(f)(a)idh -(e)ann -(e)amar -áil -igí``.
"""

from __future__ import annotations

_VOWELS = "aeiouáéíóú"

_ECLIPSIS = ("bhf", "mb", "gc", "nd", "bp", "dt", "ng", "ts")

_LENITED = ("bh", "ch", "dh", "fh", "gh", "mh", "ph", "sh", "th")

_SUFFIXES = (
    "eamar", "amar", "faidh", "fidh", "eacht", "anna", "acha", "eann",
    "ann", "eadh", "adh", "iúil", "úil", "mhar", "eoir", "óir", "éir",
    "áil", "igí", "acht", "ta", "te", "aí", "í",
)


def _demutate(word: str) -> str:
    # hyphenated pre-vowel prefixes: n-athair, t-éan, h-úll
    if (len(word) > 2 and word[1] == "-" and word[0] in "nht"
            and word[2] in _VOWELS):
        return word[2:]
    for cl in _ECLIPSIS:
        if word.startswith(cl) and len(word) > len(cl) + 1:
            # every eclipsis prefix is one letter long except bhf (bh
            # masking f): drop 2 chars there, 1 everywhere else
            return word[2:] if cl == "bhf" else word[1:]
    # lenition: C + h + (vowel | r l n)
    if (len(word) > 2 and word[:2] in _LENITED
            and (word[2] in _VOWELS or word[2] in "rln")):
        return word[0] + word[2:]
    # n/t before a vowel with the hyphen already stripped by punctuation
    # cleaning (nathair is also a real word — only strip the unambiguous
    # t+vowel shape, which native orthography does not use)
    if len(word) > 2 and word[0] == "t" and word[1] in "áéíóú":
        return word[1:]
    return word


def stem(word: str) -> str:
    """Stem one lowercase Irish token (total on arbitrary input).

    Suffixes strip to a fixpoint (plural rides on top of the agentive:
    ceoltóirí loses í then óir, landing on the same stem as ceoltóir),
    then a residual final e/a (the genitive vowel: scoile→scoil)."""
    w = _demutate(word)
    changed = True
    while changed:
        changed = False
        for suf in _SUFFIXES:
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: -len(suf)]
                changed = True
                break
    if w[-1:] in ("e", "a") and len(w) >= 4:
        w = w[:-1]
    return w

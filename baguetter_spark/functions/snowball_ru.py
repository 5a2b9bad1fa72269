"""Vendored pure-Python Russian Snowball stemmer.

The reference resolves ``stemmer="russian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:46`);
implemented here from the published algorithm (snowballstem.org "The
Russian stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

All suffix tests take place in RV (the region after the first vowel);
the derivational step tests R2.  ``ё`` is folded to ``е`` up front, per
the spec's note that the two are treated identically.
"""

from __future__ import annotations

_VOWELS = "аеиоуыэюя"

# -- suffix classes (spec lists, longest-match) -------------------------------
# group-1 entries must be preceded by а or я (the preceding letter stays)
_PERF_GERUND_1 = ("вшись", "вши", "в")
_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_REFLEXIVE = ("ся", "сь")

_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")

_VERB_1 = (
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено",
    "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_SUPERLATIVE = ("ейше", "ейш")


def _rv_start(word: str) -> int:
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            return i + 1
    return len(word)


def _r2_start(word: str) -> int:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return n


def _longest(word: str, rv: int, plain: tuple[str, ...],
             preceded: tuple[str, ...] = ()) -> str | None:
    """Longest suffix of ``word`` lying inside RV.  ``plain`` entries match
    as-is; ``preceded`` entries additionally require the letter before the
    suffix to be а/я (letter kept, and itself inside RV, matching the
    Snowball code where the а/я is part of the among pattern)."""
    best: str | None = None
    best_len = 0
    for s in plain:
        if len(s) > best_len and word.endswith(s) and len(word) - len(s) >= rv:
            best, best_len = s, len(s)
    for s in preceded:
        if len(s) + 1 > best_len and (
            word.endswith("а" + s) or word.endswith("я" + s)
        ) and len(word) - len(s) - 1 >= rv:
            best, best_len = s, len(s) + 1  # rank by full pattern length
    return best


def stem(word: str) -> str:
    word = word.replace("ё", "е")
    rv = _rv_start(word)

    # Step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    g = _longest(word, rv, _PERF_GERUND_2, _PERF_GERUND_1)
    if g is not None:
        word = word[: len(word) - len(g)]
    else:
        r = _longest(word, rv, _REFLEXIVE)
        if r is not None:
            word = word[: len(word) - len(r)]
        a = _longest(word, rv, _ADJECTIVE)
        if a is not None:
            word = word[: len(word) - len(a)]
            p = _longest(word, rv, _PARTICIPLE_2, _PARTICIPLE_1)
            if p is not None:
                word = word[: len(word) - len(p)]
        else:
            v = _longest(word, rv, _VERB_2, _VERB_1)
            if v is not None:
                word = word[: len(word) - len(v)]
            else:
                nn = _longest(word, rv, _NOUN)
                if nn is not None:
                    word = word[: len(word) - len(nn)]

    # Step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # Step 3: derivational ость/ост in R2
    r2 = _r2_start(word)
    for d in ("ость", "ост"):
        if word.endswith(d) and len(word) - len(d) >= r2:
            word = word[: len(word) - len(d)]
            break

    # Step 4: ONE of undouble-нн / superlative / soft sign (the spec's
    # among picks the single longest matching suffix and runs its action)
    s = _longest(word, rv, _SUPERLATIVE)
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    elif s is not None:
        word = word[: len(word) - len(s)]
        if word.endswith("нн") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("ь") and len(word) - 1 >= rv:
        word = word[:-1]
    return word

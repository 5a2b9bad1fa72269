"""Vendored dictionary-less Krovetz (KStem) inflectional stemmer.

The reference registers ``stemmer="krovetz"`` via the ``krovetzstemmer``
C++ package (`baguetter/indices/sparse/text_preprocessor/stemmer.py:16`),
a port of the Lemur Project's KStem.  The algorithm is public (R. Krovetz,
"Viewing Morphology as an Inference Process", SIGIR 1993; the Lemur /
Lucene KStem implementations are open source), but it is *lexicon-driven*:
a ~30k-headword dictionary plus exception tables gate most transforms.
That lexicon is not available offline, so this module implements the
dictionary-less projection of the algorithm:

- The **derivational** steps (-ity, -ness, -ion, -er, -ly, -al, -ive,
  -ize, -ment, -ble, -ism, -ic, -ncy, -nce) in KStem accept a transform
  ONLY when the candidate is found in the lexicon and otherwise RESTORE
  the original word.  With no lexicon, identity is therefore the correct
  (not merely convenient) behavior — these steps are omitted.
- The **inflectional** steps (plural -s, past tense -ed, aspect -ing)
  have non-dictionary default branches in the published algorithm; those
  defaults are implemented here, with the lexicon checks replaced by the
  deterministic heuristics documented on each function (syllable-count
  e-restoration, consonant-undoubling with the s/z exception and a
  syllable-conditional rule for ll).

Consequences, stated honestly: outputs match dictionary-KStem on regular
inflection (``policies``→``policy``, ``dropped``→``drop``,
``hoping``→``hope``) and intentionally diverge where only the lexicon can
decide (e.g. ``fascinating``→``fascinat`` here vs ``fascinate`` with the
lexicon; irregular forms like ``feet`` are left alone).  Golden pairs in
tests/test_preprocess.py are hand-traced through THESE rules, with the
known divergences called out inline.

Like the reference's stemmer the input is assumed lowercased by the
pipeline; non-alphabetic or very short (<3) tokens pass through unchanged.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# Consonants that stay doubled when undoubling a past/aspect stem:
# "call"+"ed" -> "called" must return "call", not "cal".  s/z doubling is
# orthographically stable in English ("pass", "buzz"); "ll" is stable in
# MONOSYLLABIC bases ("call", "spell", "fall") but is CVC doubling in
# multisyllabic ones ("control" -> "controlled", "cancel", "travel"), so
# the l rule is syllable-conditional (see _undouble; "install" is the
# documented casualty).  Other doubled finals always arise from the CVC
# doubling rule ("drop" -> "dropped").
_KEEP_DOUBLED = frozenset("sz")


def _is_vowel(ch: str, prev: str | None) -> bool:
    """``y`` acts as a vowel after a consonant (``try``, ``dying``)."""
    if ch in _VOWELS:
        return True
    return ch == "y" and prev is not None and prev not in _VOWELS


def _syllables(word: str) -> int:
    """Number of vowel groups — the stand-in for the lexicon's implicit
    "is this a complete word" signal in the e-restoration heuristic."""
    n = 0
    prev_v = False
    prev: str | None = None
    for ch in word:
        v = _is_vowel(ch, prev)
        if v and not prev_v:
            n += 1
        prev_v = v
        prev = ch
    return n


def _has_vowel(word: str) -> bool:
    return _syllables(word) > 0


def _ends_cvc(word: str) -> bool:
    """consonant-vowel-consonant ending, last consonant not w/x/y — the
    shape whose -ed/-ing form dropped a silent e (``hope`` -> ``hoped``)."""
    if len(word) < 3:
        return False
    c1, v, c2 = word[-3], word[-2], word[-1]
    return (
        not _is_vowel(c1, word[-4] if len(word) > 3 else None)
        and _is_vowel(v, c1)
        and c2 not in _VOWELS
        and c2 not in "wxy"
    )


def _undouble(word: str) -> str:
    """Undo CVC consonant doubling: ``dropp`` -> ``drop``; keep stable
    doubles (``pass``, ``buzz``, monosyllabic ``call``/``spell``) and
    vowel pairs intact; multisyllabic ``ll`` undoubles (``controll`` ->
    ``control``, ``cancell`` -> ``cancel``)."""
    if (
        len(word) >= 3
        and word[-1] == word[-2]
        and word[-1] not in _VOWELS
        and word[-1] not in _KEEP_DOUBLED
        and (word[-1] != "l" or _syllables(word[:-1]) >= 2)
    ):
        return word[:-1]
    return word


def _restore_e(word: str) -> str:
    """Silent-e restoration after stripping -ed/-ing.  The lexicon check is
    approximated by syllable count: one-syllable CVC stems overwhelmingly
    come from e-final bases (``hop(ed)``->``hope``, ``mak(ing)``->``make``),
    while multi-syllable stems are usually complete words (``visit``,
    ``happen``) — KStem's lexicon decides this case; we document the
    divergence (``fascinat`` stays, lexicon-KStem gives ``fascinate``)."""
    if _ends_cvc(word) and _syllables(word) == 1:
        return word + "e"
    return word


def _plural(word: str) -> str:
    """KStem plural step (default branches).

    -ies -> -y when the -y form keeps >=3 chars, else -ie (``policies`` ->
    ``policy``, ``ties`` -> ``tie``, ``dies`` -> ``die``); sibilant -es
    (-sses/-shes/-ches/-xes/-zes) drops -es (``classes`` -> ``class``,
    ``boxes`` -> ``box``); other -es drops -s (``tables`` -> ``table``);
    bare -s drops unless -ss/-us/-is (``cats`` -> ``cat``; ``glass``,
    ``bus``, ``basis`` unchanged)."""
    if not word.endswith("s"):
        return word
    if word.endswith("ies"):
        if len(word) >= 5:
            return word[:-3] + "y"
        return word[:-1]
    if word.endswith("es"):
        if (
            word.endswith(("sses", "shes", "ches", "xes"))
            and len(word) > 4
        ):
            return word[:-2]
        # -zes singulars are usually e-final (size, prize) unlike the
        # sibilant classes above, so only the "s" drops
        if len(word) > 3:
            return word[:-1]
        return word
    if word.endswith(("ss", "us", "is")):
        return word
    if len(word) >= 4 and _has_vowel(word[:-1]):
        return word[:-1]
    return word


def _past(word: str) -> str:
    """KStem past-tense step (default branches).

    -ied -> -y / -ie by the same length split as -ies (``applied`` ->
    ``apply``, ``died`` -> ``die``); -eed -> -ee when the prefix bears a
    vowel (``agreed`` -> ``agree``; ``feed``/``speed`` unchanged);
    otherwise strip -ed from a vowel-bearing stem, then undouble
    (``dropped`` -> ``drop``) and e-restore (``hoped`` -> ``hope``;
    two-letter stems always restore: ``used`` -> ``use``)."""
    if not word.endswith("ed") or len(word) < 4:
        return word
    if word.endswith("ied"):
        if len(word) >= 5:
            return word[:-3] + "y"
        return word[:-1]
    if word.endswith("eed"):
        # Latin-root -ceed verbs (exceed, succeed, proceed) are their own
        # base form: stripping would split the lexeme across two index
        # terms (exceed -> "excee" vs exceeded -> "exceed")
        if _has_vowel(word[:-3]) and not word[:-3].endswith("c"):
            return word[:-1]
        return word
    stem = word[:-2]
    if not _has_vowel(stem):
        return word
    if len(stem) == 2:
        return stem + "e"
    undoubled = _undouble(stem)
    if undoubled != stem:
        return undoubled
    return _restore_e(stem)


def _aspect(word: str) -> str:
    """KStem aspect (-ing) step (default branches).

    -ying on a one-consonant base -> -ie (``dying`` -> ``die``, ``lying``
    -> ``lie``); otherwise strip -ing from a vowel-bearing stem of >=2
    chars, then undouble (``running`` -> ``run``) and e-restore
    (``hoping`` -> ``hope``); ``sing``/``ring``-class words are protected
    by the stem-length and vowel checks (``bring`` -> stem ``br`` has no
    vowel; ``sing``/``king`` are too short)."""
    if not word.endswith("ing") or len(word) < 5:
        return word
    if word.endswith("ying") and len(word) == 5:
        return word[:-4] + "ie"
    stem = word[:-3]
    if len(stem) < 2 or not _has_vowel(stem):
        return word
    undoubled = _undouble(stem)
    if undoubled != stem:
        return undoubled
    return _restore_e(stem)


def stem(word: str) -> str:
    """Dictionary-less KStem: inflectional cascade only (see module doc)."""
    if len(word) < 3 or not word.isalpha():
        return word
    word = _plural(word)
    word = _past(word)
    return _aspect(word)

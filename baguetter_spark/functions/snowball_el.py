"""Vendored pure-Python Greek stemmer (light inflectional stripper).

The reference resolves ``stemmer="greek"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:32`),
a codification of Ntais (2006) / Saroukos (2008).  Implemented here as
the light-stemming core of that family: normalize (final sigma ς→σ,
fold the tonos/dialytika accents ά έ ή ί ό ύ ώ ϊ ϋ), then one
longest-match strip over the productive inflectional endings — the
noun/adjective case/number endings of the three declensions and the
active/passive person endings of the regular verb — with >= 3
codepoints of stem remaining.  The full Ntais rule cascade (exception
lists, recoding) is documented as the remaining gap.  Goldens in
tests/test_preprocess.py are hand-traced for paradigm convergence
(άνθρωπος/ανθρώπου/άνθρωποι/ανθρώπων → ανθρωπ, γυναίκα/γυναίκες →
γυναικ, γράφω/γράφεις/γράφουν → γραφ).
"""

from __future__ import annotations

_ACCENT_MAP = str.maketrans(
    {"ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ",
     "ώ": "ω", "ϊ": "ι", "ϋ": "υ", "ΐ": "ι", "ΰ": "υ", "ς": "σ"}
)

# longest-match inflectional endings (nouns/adjectives + regular verbs),
# written in NORMALIZED form (σ for final sigma, no accents) since they
# match after the translate above
_SUFFIXES: tuple[str, ...] = (
    "ομαστε", "ονται", "εσαι", "εται", "ομαι", "ουμε", "ουνε", "ησαν",
    "ηκαν", "ειτε", "ουσα",
    "ουσ", "εισ", "εων", "ιου", "ιων", "ιεσ", "ηκα", "ηκε", "ουν",
    "ατε", "αμε", "ετε",
    "ια", "ασ", "εσ", "οσ", "ου", "ον", "οι", "ων", "ησ", "ει", "αν",
    "η", "α", "ο", "ω", "ε", "ι", "υ",
)


def stem(word: str) -> str:
    """Stem one lowercase Greek token (total on arbitrary input)."""
    w = word.translate(_ACCENT_MAP)
    for suf in _SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w

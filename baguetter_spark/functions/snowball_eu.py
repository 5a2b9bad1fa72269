"""Vendored pure-Python Basque stemmer (light declension stripper).

The reference resolves ``stemmer="basque"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:24`);
the Snowball Basque algorithm is a suffix stripper over the language's
agglutinative case system.  Implemented here in that shape: a
longest-match strip over the determiner+case endings (absolutive/
ergative/dative/genitive/comitative/benefactive/motivative, the -eta-
plural locatives, ablative/allative/locative, instrumental, partitive,
the adnominal -ko) plus the productive verb morphology (perfective
-tu/-du, imperfective -tzen/-ten, future -ko riding on the participle) —
iterated to a fixpoint so stacked morphology (gizon+aren+a) lands on the
stem, with >= 3 codepoints always remaining.  Goldens in
tests/test_preprocess.py are hand-traced and checked for paradigm
convergence (gizona/gizonak/gizonaren/gizonarekin → gizon,
etxea/etxean/etxeetan/etxetik/etxera → etxe, hartu/hartzen/hartuko →
har).
"""

from __future__ import annotations

_SUFFIXES: tuple[str, ...] = (
    "arentzat", "arengan", "agatik", "arekin", "entzat", "etako",
    "etatik", "etara", "aren", "ekin", "etan", "tzen", "ten", "ari",
    "tik", "ak", "ek", "ei", "en", "az", "ez", "ik", "ko", "ra", "an",
    "tu", "du", "a",
)

_SUFFIXES = tuple(sorted(_SUFFIXES, key=len, reverse=True))


def stem(word: str) -> str:
    """Stem one lowercase Basque token (total on arbitrary input)."""
    w = word
    changed = True
    while changed:
        changed = False
        for suf in _SUFFIXES:
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                w = w[: -len(suf)]
                changed = True
                break
    return w

"""Vendored pure-Python Lithuanian stemmer (light inflectional stripper).

The reference resolves ``stemmer="lithuanian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:38`);
the Snowball Lithuanian algorithm is a suffix stripper over the language's
closed inflectional inventory.  Implemented here in that shape: a
longest-match strip over the full case endings of the five noun
declensions (singular and plural), the adjectival degree suffixes, the
regular verb endings (infinitive, present/past/future persons, the
-davo habitual), and the deverbal ``-imas/-ymas/-umas`` nominalizer —
iterated to a fixpoint so stacked morphology (``veikimo`` = veik+im+o)
lands on the same stem as the base form, with >= 3 codepoints of stem
always remaining.  Goldens in tests/test_preprocess.py are hand-traced
and checked for whole-paradigm convergence (namas/namo/namui/namuose →
nam, knyga/knygos/knygomis → knyg, dirbti/dirba/dirbo → dirb).
"""

from __future__ import annotations

# grouped by codepoint length, longest first; one fixpoint loop over all
_SUFFIXES: tuple[str, ...] = (
    # superlative / comparative (adjectives)
    "iausias", "iausia", "esnis", "esnė",
    # long case endings (plural locative/dative/instrumental, deverbal)
    "iuose", "uose", "iams", "omis", "ėmis", "umis", "imis", "iais",
    "imas", "ymas", "umas", "davo",
    "ams", "oms", "ėms", "ums", "ims", "ais", "ose", "ėse", "yse",
    "yje", "oje", "ėje", "uje", "aus", "iui", "umi", "imi", "ius",
    "iai", "ios", "ies", "iau", "ite", "ame", "ime",
    # two-letter endings (nominative/genitive/accusative/…, verb persons)
    "as", "is", "ys", "us", "os", "ės", "ai", "ei", "ui", "au", "iu",
    "ti", "tų", "ių", "ūs", "ą", "į", "ų", "ę", "ė",
    # deverbal nominalizer stems exposed by a previous strip (veik-im-o)
    "im", "ym", "um",
    # single vowels (bare endings)
    "a", "e", "o", "u", "i", "y",
)


def stem(word: str) -> str:
    """Stem one lowercase Lithuanian token (total on arbitrary input)."""
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

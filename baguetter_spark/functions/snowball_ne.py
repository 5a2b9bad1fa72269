"""Vendored pure-Python Nepali stemmer (lightweight suffix stripper).

The reference resolves ``stemmer="nepali"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:39`);
the Snowball Nepali algorithm (Shrestha & Bartunov) is itself a
category-wise suffix stripper over solid-written postpositions, the
plural marker, and verbal endings.  Implemented here in that shape,
following this package's Hindi module (Ramanathan & Rao-style light
stemming — see `snowball_hi.py`):

- pass 1: longest-match over the solid-written case clitics /
  postpositions (को का की ले लाई बाट मा सँग देखि सम्म तिर माथि मुनि
  मध्ये द्वारा, plus the हरू-combined forms) — Snowball's category 1;
- pass 2: the plural marker हरू / हरु if still trailing (so
  किताबहरूको loses को then हरू in one call);
- pass 3: common verbal endings (छु छौ छन् छिन् न्छ नु एको/ेको
  participles, the absolutive एर/ेर) — Snowball's categories 2/3,
  kept to the unambiguous members so nouns are not over-stripped;

every strip requires >= 2 codepoints of stem to remain.  Total on
arbitrary unicode: non-Devanagari tokens match no suffix and pass
through unchanged.  Goldens in tests/test_preprocess.py are hand-traced
through these tables (किताबहरूको→किताब, घरमा→घर, गर्छु→गर्, ...).
"""

from __future__ import annotations

# solid-written postpositions / case clitics, longest (codepoints) first
_POSTPOSITIONS: tuple[str, ...] = (
    "हरूलाई", "हरुलाई", "हरूबाट", "हरुबाट", "हरूको", "हरुको", "हरूका",
    "हरुका", "हरूकी", "हरुकी", "हरूले", "हरुले", "हरूमा", "हरुमा",
    "द्वारा", "मध्ये", "देखि", "सम्म", "माथि", "मुनि", "लाई", "बाट",
    "सँग", "संग", "तिर", "को", "का", "की", "ले", "मा",
)

_PLURAL: tuple[str, ...] = ("हरू", "हरु")

_VERBAL: tuple[str, ...] = (
    "छिन्", "छन्", "न्छ", "छु", "छौ", "एको", "ेको", "एका", "ेका",
    "एकी", "ेकी", "एर", "ेर", "नु",
)


def _strip_one(word: str, suffixes: tuple[str, ...]) -> str:
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= 2:
            return word[: -len(s)]
    return word


def stem(word: str) -> str:
    """Stem one lowercase Nepali token (total on arbitrary input)."""
    w = _strip_one(word, _POSTPOSITIONS)
    w = _strip_one(w, _PLURAL)
    w = _strip_one(w, _VERBAL)
    return w

"""Vendored pure-Python Hindi stemmer (lightweight suffix stripper).

The reference resolves ``stemmer="hindi"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:33`);
the Snowball algorithm codifies the published lightweight stemmer of
Ramanathan & Rao, *A Lightweight Stemmer for Hindi* (EACL 2003 workshop
on computational linguistics for South Asian languages), which is what is
implemented here from the paper's suffix table:

- one pass, longest-match over a fixed Devanagari suffix list grouped by
  length (5..1 codepoints), conditioned only on enough of the word
  remaining (≥ 2 codepoints — the paper strips a length-n suffix from
  words longer than n+1);
- no recoding, no iteration: the suffix classes cover the productive
  nominal/verbal inflections (gender/number/case on nouns, tense/aspect/
  person on verbs) — matras ``ा ि ी ु ू े ो``, plural/oblique ``ें ों ीं
  ियाँ ियों``, infinitive/participle ``ना ने नी ता ती ते``, future
  ``ेगा ेगी ेंगे ेंगी ूंगा ूंगी``, and the ``ाकर/ाइए/ाया``-type
  derivational endings;
- suffixes are matched on raw codepoints (no NFC assumption beyond what
  the preprocessor's normalization already applies); anusvara/candrabindu
  variants (``ाएं/ाएँ`` style) appear in both spellings where the paper
  lists them.

Goldens in tests/test_preprocess.py are hand-traced through this table
(लड़कियाँ→लड़क, बनाया→बन, किताबें→किताब, ...).
"""

from __future__ import annotations

# the paper's table, grouped by suffix length in codepoints, longest first
_SUFFIXES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (5, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (4, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")),
    (3, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")),
    (2, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
         "ता", "ाँ", "ां", "ों", "ें")),
    (1, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)


def stem(word: str) -> str:
    """Stem one lowercase Hindi token (total: non-Devanagari input simply
    matches no suffix and is returned unchanged)."""
    n = len(word)
    for suf_len, sufs in _SUFFIXES:
        if n > suf_len + 1 and word.endswith(sufs):
            return word[:-suf_len]
    return word

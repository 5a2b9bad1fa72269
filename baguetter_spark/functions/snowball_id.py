"""Vendored pure-Python Indonesian stemmer (Tala confix-stripping).

The reference resolves ``stemmer="indonesian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:36`);
the Snowball algorithm is itself a codification of the published
dictionary-free confix-stripping stemmer of F. Z. Tala, *A Study of
Stemming Effects on Information Retrieval in Bahasa Indonesia* (Univ. of
Amsterdam, 2003), which is what is implemented here, from the paper:

- words are stemmed only while they keep more than 2 syllables; the
  syllable measure is the vowel count (vowels ``a e i o u``), re-checked
  before every removal step;
- step order: inflectional particle (``-kah -lah -tah -pun``) →
  possessive pronoun (``-ku -mu -nya``) → derivational affixes:
  if a first-order prefix is removed, then (measure permitting) a
  derivational suffix (``-kan -an -i``), and only if that suffix was
  removed, a second-order prefix; if no first-order prefix matched,
  a second-order prefix first and then a derivational suffix;
- first-order prefixes with the paper's deterministic sound-recovery
  rules (no dictionary, so each nasal assimilation picks its single
  most common source): ``meny+V → s+V``, ``men+V → t+V``,
  ``mem+V → p+V``, ``meng+V → V`` (likewise for the ``peng`` family),
  plain deletion for ``meng/men/mem/me/peng/pen/pem`` before
  consonants and for ``di- ter- ke- se-``;
- second-order prefixes: ``ber-``, ``bel-`` (only in ``belajar``-type
  words), ``be-`` before consonant+``er`` (``bekerja``), ``per-``,
  ``pel-`` (``pelajar``), ``pe-``;
- the paper's disallowed confix pairs gate suffix removal against the
  prefix family actually removed: ``be–i``, ``di–an``, ``ke–i/kan``,
  ``me–an``, ``se–i/kan``; additionally ``-i`` is never stripped from
  a ``-si`` ending (loanwords like *televisi*).

Goldens in tests/test_preprocess.py are hand-traced through this full
pipeline on real Indonesian morphology (memilih→pilih, keberhasilan→
hasil, memberlakukan→laku, sebagainya→bagai, ...).
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _measure(w: str) -> int:
    return sum(1 for c in w if c in _VOWELS)


def _strip_particle(w: str) -> str:
    for suf in ("kah", "lah", "tah", "pun"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _strip_possessive(w: str) -> str:
    for suf in ("nya", "ku", "mu"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _first_order(w: str) -> tuple[str, str] | None:
    """Remove a first-order derivational prefix; return (word, family)."""
    # meng- family (family "me"): nasal-assimilation recovery before vowels
    if w.startswith("meny") and len(w) > 4 and w[4] in _VOWELS:
        return "s" + w[4:], "me"
    if w.startswith("meng") and len(w) > 4:
        return w[4:], "me"
    if w.startswith("mem") and len(w) > 3:
        if w[3] in _VOWELS:
            return "p" + w[3:], "me"
        return w[3:], "me"
    if w.startswith("men") and len(w) > 3:
        if w[3] in _VOWELS:
            return "t" + w[3:], "me"
        return w[3:], "me"
    if w.startswith("me") and len(w) > 2:
        return w[2:], "me"
    # peng- family (family "pe"); bare "pe-" is SECOND order, not here
    if w.startswith("peny") and len(w) > 4 and w[4] in _VOWELS:
        return "s" + w[4:], "pe"
    if w.startswith("peng") and len(w) > 4:
        return w[4:], "pe"
    if w.startswith("pem") and len(w) > 3:
        if w[3] in _VOWELS:
            return "p" + w[3:], "pe"
        return w[3:], "pe"
    if w.startswith("pen") and len(w) > 3:
        if w[3] in _VOWELS:
            return "t" + w[3:], "pe"
        return w[3:], "pe"
    if w.startswith("di") and len(w) > 2:
        return w[2:], "di"
    if w.startswith("ter") and len(w) > 3:
        return w[3:], "te"
    if w.startswith("ke") and len(w) > 2:
        return w[2:], "ke"
    if w.startswith("se") and len(w) > 2:
        return w[2:], "se"
    return None


def _second_order(w: str) -> tuple[str, str] | None:
    if w.startswith("belajar"):
        return w[3:], "be"
    if w.startswith("ber") and len(w) > 3:
        return w[3:], "be"
    # be- before consonant + "er" (bekerja -> kerja)
    if (
        w.startswith("be")
        and len(w) >= 5
        and w[2] not in _VOWELS
        and w[3:5] == "er"
    ):
        return w[2:], "be"
    if w.startswith("pelajar"):
        return w[3:], "pe"
    if w.startswith("per") and len(w) > 3:
        return w[3:], "pe"
    if w.startswith("pe") and len(w) > 2:
        return w[2:], "pe"
    return None


def _strip_suffix(w: str, family: str | None) -> str:
    """Longest-literal-match over -kan/-an/-i; the matched suffix's
    disallowed-confix condition decides (no retry with a shorter one,
    mirroring Snowball ``among`` semantics)."""
    if w.endswith("kan"):
        if family not in ("ke", "se"):
            return w[:-3]
        return w
    if w.endswith("an"):
        if family not in ("di", "me"):
            return w[:-2]
        return w
    if w.endswith("i"):
        if family not in ("be", "ke", "se") and not w.endswith("si"):
            return w[:-1]
        return w
    return w


def stem(word: str) -> str:
    """Stem one lowercase Indonesian token (total: returns the input on
    any word it cannot stem)."""
    w = word
    if _measure(w) <= 2:
        return w
    w = _strip_particle(w)
    if _measure(w) > 2:
        w = _strip_possessive(w)
    if _measure(w) <= 2:
        return w
    first = _first_order(w)
    if first is not None:
        w, fam = first
        if _measure(w) > 2:
            w2 = _strip_suffix(w, fam)
            if w2 != w and _measure(w2) > 2:
                second = _second_order(w2)
                if second is not None:
                    return second[0]
            return w2
        return w
    second = _second_order(w)
    fam = None
    if second is not None:
        w, fam = second
    if _measure(w) > 2:
        w = _strip_suffix(w, fam)
    return w

"""Vendored pure-Python ARLSTem Arabic light stemmer (v1 + v2).

The reference registers ``stemmer="arlstem"`` / ``"arlstem2"`` via nltk
(`baguetter/indices/sparse/text_preprocessor/stemmer.py:20-21`); nltk is
not installable offline, so this module implements the published
algorithm directly: Abainia, Ouamour & Sayoud, "A Novel Robust Arabic
Light Stemmer" (J. Exp. Theor. AI, 2017), and the revised affix handling
of ARLSTem v2 (Abainia & Rebbani, 2019).  ARLSTem is a *light* stemmer:
it strips conjunctions, definite articles, feminine markers, pronoun
suffixes, sound-plural endings and (when no noun pattern matched) verb
conjugation affixes — it does not extract roots (contrast
``functions/isri.py``).

Provenance note: the stage ORDER and the decision flow (noun path when a
definite article is found, verb path otherwise) are the paper's; the
affix inventories below are transcribed from the published stage
descriptions.  Branch-level parity with nltk's port is untested offline —
golden pairs in tests are hand-traced through the rules as written here.

Total on arbitrary unicode: non-Arabic tokens pass through unchanged (a
stemmer exception inside the tokenize UDF would fail the Spark task).
"""

from __future__ import annotations

_DIACRITICS = frozenset(
    "ًٌٍَُِّْ"
    "ٰٕٖٓٔٗ٘ـ"  # incl. tatweel
)
_HAMZATED_ALIF = {"آ": "ا", "أ": "ا", "إ": "ا"}

_WAW = "و"
_TA_MARBUTA = "ة"
_ALIF_MAQSURA = "ى"
_YA = "ي"

# definite-article prefixes, longest first: فبال وبال فكال / بال كال وال / ال لل
_ARTICLES_4 = ("فبال", "وبال", "فكال")
_ARTICLES_3 = ("بال", "كال", "وال")
_ARTICLES_2 = ("ال", "لل")

# v2 adds the bare preposition/conjunction particles ب ك ل ف before the
# article pass (the v1 inventory only reaches them fused with ال above)
_PARTICLES_1 = ("ب", "ك", "ل", "ف")

# possessive-pronoun suffixes, longest first: كما هما / كم كن هم هن ها نا ني / ك ه ي
_PRON_3 = ("كما", "هما")
_PRON_2 = ("كم", "كن", "هم", "هن", "ها", "نا", "ني")
_PRON_1 = ("ك", "ه", "ي")

# sound-plural / dual endings: تان تين / ون ين ان ات
_PLURAL_3 = ("تان", "تين")
_PLURAL_2 = ("ون", "ين", "ان", "ات")

# verb conjugation affixes (imperfective prefixes incl. future س forms,
# perfective/person suffixes), longest first
_VERB_PRE_2 = ("سي", "ست", "سن", "سا")
_VERB_PRE_1 = ("ي", "ت", "ن", "ا")
_VERB_SUF_3 = ("تما", "تمو")
_VERB_SUF_2 = ("تم", "تن", "نا", "وا", "ون", "ين", "ات", "تا")
_VERB_SUF_1 = ("ت", "ا", "ن")


def _norm(word: str) -> str:
    out = [
        _HAMZATED_ALIF.get(ch, ch) for ch in word if ch not in _DIACRITICS
    ]
    # final alif maqsura -> ya (orthographic variant fold, paper §norm)
    if out and out[-1] == _ALIF_MAQSURA:
        out[-1] = _YA
    return "".join(out)


def _strip_waw(word: str) -> str:
    """Leading conjunction و comes off when >= 3 letters remain."""
    if word.startswith(_WAW) and len(word) >= 4:
        return word[1:]
    return word


def _article(word: str) -> str | None:
    """Strip one definite-article prefix; None when none matched."""
    for p in _ARTICLES_4:
        if word.startswith(p) and len(word) - 4 >= 2:
            return word[4:]
    for p in _ARTICLES_3:
        if word.startswith(p) and len(word) - 3 >= 2:
            return word[3:]
    for p in _ARTICLES_2:
        if word.startswith(p) and len(word) - 2 >= 2:
            return word[2:]
    return None


def _pronoun(word: str) -> str | None:
    """Strip one possessive-pronoun suffix; None when none matched."""
    for s in _PRON_3:
        if word.endswith(s) and len(word) - 3 >= 3:
            return word[:-3]
    for s in _PRON_2:
        if word.endswith(s) and len(word) - 2 >= 3:
            return word[:-2]
    for s in _PRON_1:
        if word.endswith(s) and len(word) - 1 >= 3:
            return word[:-1]
    return None


def _fem2masc(word: str) -> str:
    """Feminine marker off the end (ta marbuta), floor of 3 letters."""
    if word.endswith(_TA_MARBUTA) and len(word) - 1 >= 3:
        return word[:-1]
    return word


def _plural2sing(word: str) -> str | None:
    """Strip one sound-plural/dual ending; None when none matched."""
    for s in _PLURAL_3:
        if word.endswith(s) and len(word) - 3 >= 2:
            return word[:-3]
    for s in _PLURAL_2:
        if word.endswith(s) and len(word) - 2 >= 2:
            return word[:-2]
    return None


def _verb(word: str) -> str:
    """Verb conjugation stripping (paper's verb path): one prefix and/or
    one suffix, each with a floor of 3 remaining letters."""
    w = word
    for p in _VERB_PRE_2:
        if w.startswith(p) and len(w) - 2 >= 3:
            w = w[2:]
            break
    else:
        for p in _VERB_PRE_1:
            if w.startswith(p) and len(w) - 1 >= 3:
                w = w[1:]
                break
    for s in _VERB_SUF_3:
        if w.endswith(s) and len(w) - 3 >= 3:
            return w[:-3]
    for s in _VERB_SUF_2:
        if w.endswith(s) and len(w) - 2 >= 3:
            return w[:-2]
    for s in _VERB_SUF_1:
        if w.endswith(s) and len(w) - 1 >= 3:
            return w[:-1]
    return w


def _stem_common(word: str, *, v2: bool) -> str:
    w = _norm(word)
    w = _strip_waw(w)
    if v2:
        # v2: bare particle (ب ك ل ف) before the definite article (the v1
        # inventory only reaches them fused as بال/كال/فبال/...).  A bare
        # particle commits ONLY when an article follows: elsewhere a single
        # leading letter is ambiguous with a radical (كتاب starts with the
        # particle letter ك) and the light stemmer prefers precision.
        for p in _PARTICLES_1:
            if w.startswith(p) and _article(w[1:]) is not None:
                w = w[1:]
                break
    art = _article(w)
    if art is not None:
        # noun path: article found -> feminine marker, pronoun, plural
        w = art
        pron = _pronoun(w)
        if pron is not None:
            return _fem2masc(pron)
        pl = _plural2sing(w)
        if pl is not None:
            return pl
        return _fem2masc(w)
    # no article: try noun suffixes first; verb path only when nothing
    # noun-like matched (paper's decision flow)
    pron = _pronoun(w)
    if pron is not None:
        return _fem2masc(pron)
    pl = _plural2sing(w)
    if pl is not None:
        return pl
    fem = _fem2masc(w)
    if fem != w:
        return fem
    return _verb(w)


def stem(word: str) -> str:
    """ARLSTem (2017) stem of one token."""
    return _stem_common(word, v2=False)


def stem2(word: str) -> str:
    """ARLSTem2 (2019 revision) stem of one token — v1 plus bare-particle
    prefix handling."""
    return _stem_common(word, v2=True)

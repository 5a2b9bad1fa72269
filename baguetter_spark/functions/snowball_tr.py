"""Vendored pure-Python Turkish stemmer (affix stripping, nominal).

The reference resolves ``stemmer="turkish"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:47`),
which codifies E. Çilden, *Stemming Turkish Words Using Snowball* (2007):
strip the agglutinated NOMINAL suffix chain — case, possessive, plural and
the copular ("nominal verb") endings — validating each candidate against
Turkish morphophonology; full verbal conjugation (tense/person on verb
stems) is out of scope there and here.

What this implementation takes from the published description:

- the nominal suffix inventory: plural ``-lAr``; possessives ``-(U)m
  -(U)n -(s)U -(U)mUz -(U)nUz -lArI``; case ``-(y)U -(n)U -(y)A -(n)A
  -(n)DA -(n)DAn -(y)lA -(n)Un -(n)CA``; relativizer ``-ki``; copulars
  ``-(y)Um -sUn -(y)Uz -sUnUz -(y)DU -(y)sA -(y)mUş -(y)ken -DUr
  -cAsInA``;
- validity of a candidate: (a) VOWEL HARMONY — the suffix's first vowel
  must agree with the stem's last vowel (a/ı after a ı, e/i after e i,
  a/u after o u, e/ü after ö ü); (b) BUFFER RULE — a buffered form
  (leading y/n/s) attaches only to vowel-final stems, while the bare
  vowel-initial / U-initial form attaches only to consonant-final stems;
  invariant consonant-initial forms (lar/da/dan/dır/la/ca...) attach to
  either;
- final-consonant restoration: a stem exposed by suffix removal ends in
  the voiced alternant, so word-final ``b c d ğ`` are restored to
  ``p ç t k`` after stripping (kitabı → kitab → kitap).

Documented divergences: Snowball schedules the strips as two hand-ordered
chains (nominal-verb then noun) with per-position sub-chains; here the
same validated inventory is applied as a longest-match strip iterated
under a MORPHOTACTIC FLOOR — suffix classes must come off in strictly
decreasing order, copular(4) / ki(4) > case(3) > possessive(2) >
plural(1), which is the affix order of the Turkish nominal word read
right to left (ev+ler+i+nde+ydi).  The floor is what keeps short
suffixes from chain-stripping through the root (deniz never loses its
-iz), while a full chain still unwinds (evlerinden → evleri → ev;
öğretmenlerdendi → öğretmen).  Three inventory prunings keep bare roots
stable, each trading a rare conflation for paradigm consistency: the
bare conditional ``-sA`` and buffered equative ``-(n)CA`` forms are
dropped (masa/bence-class roots), the equative ``ca/ce/ça/çe`` attaches
only to consonant-final stems (gece-class roots), and the bare dative
``a/e`` is dropped entirely — a vowel-final root would otherwise split
from its own suffixed paradigm (araba → arab but arabada → araba).  The
bare harmonic vowel ``ı/i/u/ü`` (3sg possessive = accusative surface) is
kept and deliberately strips at any chain stage, so a paradigm like
kapı/kapıdan/kapısı converges on one stem (kap) — the same conflation
class as the published algorithm's bare-form strips.  Goldens in
tests/test_preprocess.py are hand-traced through THIS pipeline.
"""

from __future__ import annotations

_VOWELS = "aeıioöuü"

# last stem vowel -> allowed suffix first-vowels (two-dimensional harmony)
_HARMONY = {
    "a": "aı", "ı": "aı", "e": "ei", "i": "ei",
    "o": "au", "u": "au", "ö": "eü", "ü": "eü",
}

# (suffix, ends_vowel, cls): ends_vowel True = stem must end in a vowel
# (buffered y/n/s forms), False = stem must end in a consonant (bare
# vowel-initial forms), None = either.  cls = morphotactic class (see
# module docstring).  Scanned longest-first; ties keep this order.
# Surface forms shared between a copular and a possessive reading
# (ım/ın/nız families) take the possessive class — the inner, safer
# parse.
_SUFFIXES: tuple[tuple[str, bool | None, int], ...] = (
    # copulars (4)
    ("casına", None, 4), ("cesine", None, 4),
    ("sınız", None, 4), ("siniz", None, 4), ("sunuz", None, 4),
    ("sünüz", None, 4),
    ("ymuş", True, 4), ("ymüş", True, 4), ("ymış", True, 4),
    ("ymiş", True, 4), ("yken", True, 4),
    ("muş", None, 4), ("müş", None, 4), ("mış", None, 4), ("miş", None, 4),
    ("ydı", True, 4), ("ydi", True, 4), ("ydu", True, 4), ("ydü", True, 4),
    ("ysa", True, 4), ("yse", True, 4),
    ("dır", None, 4), ("dir", None, 4), ("dur", None, 4), ("dür", None, 4),
    ("tır", None, 4), ("tir", None, 4), ("tur", None, 4), ("tür", None, 4),
    ("sın", None, 4), ("sin", None, 4), ("sun", None, 4), ("sün", None, 4),
    ("yız", True, 4), ("yiz", True, 4), ("yuz", True, 4), ("yüz", True, 4),
    ("yım", True, 4), ("yim", True, 4), ("yum", True, 4), ("yüm", True, 4),
    ("ken", None, 4),
    ("dı", False, 4), ("di", False, 4), ("du", False, 4), ("dü", False, 4),
    ("tı", False, 4), ("ti", False, 4), ("tu", False, 4), ("tü", False, 4),
    ("ız", False, 4), ("iz", False, 4), ("uz", False, 4), ("üz", False, 4),
    # -ki sits outside case (evdeki: ki then de), so it shares class 4
    ("ki", None, 4), ("kü", None, 4),
    # case (3).  The genitive ın/in/un/ün forms are listed at BOTH class 3
    # (genitive, can precede a possessive strip: gözlerimin) and class 2
    # below (2sg possessive, can follow a case strip: evinde) — surface-
    # identical dual-role forms get both chain positions.
    ("ndan", True, 3), ("nden", True, 3),
    ("dan", None, 3), ("den", None, 3), ("tan", None, 3), ("ten", None, 3),
    ("nda", True, 3), ("nde", True, 3),
    ("yla", True, 3), ("yle", True, 3),
    ("nın", True, 3), ("nin", True, 3), ("nun", True, 3), ("nün", True, 3),
    ("ın", False, 3), ("in", False, 3), ("un", False, 3), ("ün", False, 3),
    ("da", None, 3), ("de", None, 3), ("ta", None, 3), ("te", None, 3),
    ("la", False, 3), ("le", False, 3),
    ("yı", True, 3), ("yi", True, 3), ("yu", True, 3), ("yü", True, 3),
    ("nı", True, 3), ("ni", True, 3), ("nu", True, 3), ("nü", True, 3),
    ("ya", True, 3), ("ye", True, 3), ("na", True, 3), ("ne", True, 3),
    ("ca", False, 3), ("ce", False, 3), ("ça", False, 3), ("çe", False, 3),
    # possessive (2)
    ("ımız", False, 2), ("imiz", False, 2), ("umuz", False, 2),
    ("ümüz", False, 2),
    ("ınız", False, 2), ("iniz", False, 2), ("unuz", False, 2),
    ("ünüz", False, 2),
    ("mız", True, 2), ("miz", True, 2), ("muz", True, 2), ("müz", True, 2),
    ("nız", True, 2), ("niz", True, 2), ("nuz", True, 2), ("nüz", True, 2),
    ("ları", None, 2), ("leri", None, 2),
    ("sı", True, 2), ("si", True, 2), ("su", True, 2), ("sü", True, 2),
    ("ım", False, 2), ("im", False, 2), ("um", False, 2), ("üm", False, 2),
    ("ın", False, 2), ("in", False, 2), ("un", False, 2), ("ün", False, 2),
    # bare harmonic vowel: the 3sg-possessive-after-consonant reading
    # (evi, yolu, kitabı); the surface-identical accusative strips the
    # same character, so one class-2 entry covers both and stays
    # strippable at every later chain stage (paradigm consistency)
    ("ı", False, 2), ("i", False, 2), ("u", False, 2), ("ü", False, 2),
    ("m", True, 2), ("n", True, 2),
    # plural (1)
    ("lar", None, 1), ("ler", None, 1),
)

# pre-sort longest first (stable: keeps table order within a length)
_SUFFIXES = tuple(sorted(_SUFFIXES, key=lambda t: -len(t[0])))

_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def _last_vowel(w: str) -> str | None:
    for c in reversed(w):
        if c in _VOWELS:
            return c
    return None


def _first_vowel(s: str) -> str | None:
    for c in s:
        if c in _VOWELS:
            return c
    return None


def _strip_one(w: str, floor: int) -> tuple[str, int] | None:
    """One longest-valid-match strip below ``floor``, or None."""
    for suf, ends_vowel, cls in _SUFFIXES:
        if cls >= floor or not w.endswith(suf) or len(w) - len(suf) < 2:
            continue
        stem = w[: -len(suf)]
        lv = _last_vowel(stem)
        if lv is None:  # never leave a vowelless stem
            continue
        if ends_vowel is True and stem[-1] not in _VOWELS:
            continue
        if ends_vowel is False and stem[-1] in _VOWELS:
            continue
        fv = _first_vowel(suf)
        if fv is not None and fv not in _HARMONY[lv]:
            continue
        return stem, cls
    return None


def stem(word: str) -> str:
    """Stem one lowercase Turkish token (total: returns the input when no
    validated suffix applies)."""
    w = word
    floor = 5
    stripped = False
    while floor > 1:
        nxt = _strip_one(w, floor)
        if nxt is None:
            break
        w, floor = nxt
        stripped = True
    if stripped and w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w

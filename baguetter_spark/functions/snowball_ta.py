"""Vendored pure-Python Tamil stemmer (light suffix stripper).

The reference resolves ``stemmer="tamil"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:46`),
a codification of suffix stripping over Tamil's agglutinative
morphology.  Implemented here as the light core of that family:

- strip the clitic ``ும்``;
- iterate longest-match over case endings (accusative ``ை``, dative
  ``(உ)க்கு``, locative ``(ய)ில்``, genitive ``(ய)ின்/உடைய``,
  instrumental ``(ய)ால்``, sociative ``உடன்/ஓடு``), the plural ``கள்``,
  the adverbial ``ஆக``, and the regular verb endings (present
  ``கிற-``, past ``த்/ந்த்-``, future ``வ்-`` + person/number/gender);
- undo the two regular noun-sandhi alternations the stripping exposes:
  ``…ங்`` from ``ம்+கள்`` (மரங்கள்→மரங்→மரம்) and the oblique ``…த்த``
  from ``ம்`` (மரத்தில்→மரத்த→மரம்);
- >= 3 codepoints of stem must remain at every step.

Goldens in tests/test_preprocess.py are hand-traced for paradigm
convergence (மரம்/மரங்கள்/மரத்தில்/மரத்தை → மரம்,
செய்கிறேன்/செய்தேன்/செய்வேன் → செய்).
"""

from __future__ import annotations

_CLITICS: tuple[str, ...] = ("ும்",)

_SUFFIXES: tuple[str, ...] = (
    # verb: present/past/future + person endings (longest first)
    "கிறார்கள்", "கிறீர்கள்", "கின்றனர்", "கிறேன்", "கிறோம்", "கிறான்",
    "கிறாள்", "கிறார்", "கிறது", "ந்தேன்", "ந்தான்", "ந்தாள்", "ந்தார்",
    "ந்தது", "த்தேன்", "த்தான்", "தேன்", "தான்", "தாள்", "தார்", "தது",
    "வேன்", "வான்", "வாள்", "வார்", "வோம்", "வது",
    # case / postposition-like endings
    "உடைய", "ுடைய", "க்கு", "ுக்கு", "யில்", "ில்", "யின்", "ின்",
    "யால்", "ால்", "ுடன்", "ோடு", "ாக", "ை", "யை",
    # plural
    "கள்",
)

_SUFFIXES = tuple(sorted(_SUFFIXES, key=len, reverse=True))


_VOWEL_SIGNS = frozenset("ாிீுூெேைொோௌ")
_PULLI = "்"


def _is_consonant(ch: str) -> bool:
    return "க" <= ch <= "ஹ"


def _recode(w: str) -> str:
    # ம்+கள் → ங்கள்: a stripped plural leaves …ங் — restore ம்
    if w.endswith("ங்"):
        return w[:-2] + "ம்"
    # oblique …த்த்/த்த ← nominative …ம் (மரத்த(ில்) ← மரம்)
    if w.endswith("த்த்"):
        return w[:-4] + "ம்"
    if w.endswith("த்த"):
        return w[:-3] + "ம்"
    # oblique doubling …ட்ட்/ற்ற் ← …டு/று (வீட்ட(ுக்கு) ← வீடு)
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு"
    if w.endswith("ற்ற்"):
        return w[:-4] + "று"
    return w


def stem(word: str) -> str:
    """Stem one lowercase Tamil token (total on arbitrary input)."""
    w = word
    for cl in _CLITICS:
        if w.endswith(cl) and len(w) - len(cl) >= 3:
            w = w[: -len(cl)]
            break
    changed = True
    while changed:
        changed = False
        for suf in _SUFFIXES:
            if w.endswith(suf) and len(w) - len(suf) >= 3:
                base = w[: -len(suf)]
                # a vowel-sign-initial ending replaced the stem-final
                # pulli when it attached (ழ்+இல்→ழில்) — restore it
                if suf[0] in _VOWEL_SIGNS and base and _is_consonant(base[-1]):
                    base += _PULLI
                w = _recode(base)
                changed = True
                break
    return w

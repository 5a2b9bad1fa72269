"""Vendored pure-Python Finnish Snowball stemmer.

The reference resolves ``stemmer="finnish"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:28`);
implemented here from the published algorithm (snowballstem.org "The
Finnish stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

Spec conventions followed:

- V1 vowels are ``a e i o u y ä ö``; V2 = V1 minus ``y``; AEI = ``a ä e i``;
- R1 is the region after the first non-vowel following a vowel, R2 the
  same within R1; positions are marked once, up front;
- a suffix matches a step only when it lies entirely inside the step's
  region; the *conditions* attached to a suffix look left without region
  restriction (standard Snowball ``setlimit … for ([substring])`` idiom);
- each step's ``among`` takes the LONGEST matching suffix and does not
  backtrack to a shorter one when that suffix's condition fails.
"""

from __future__ import annotations

_V1 = "aeiouyäö"
_V2 = "aeiouäö"
_AEI = "aäei"
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
# particle endings: the char before kin/ko/… must be n, t or a vowel
_PARTICLE_END = _V1 + "nt"

_STEP1_PARTICLES = ("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa", "pä")

# step 3 case endings handled by the generic delete branch
_STEP3_PLAIN = (
    "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
    "ksi", "ine", "ta", "tä", "na", "nä",
)
_STEP3_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
              "hun": "u", "hyn": "y", "hän": "ä", "hön": "ö"}


def _regions(word: str) -> tuple[int, int]:
    def after_first_nonvowel_after_vowel(s: str, start: int) -> int:
        i = start
        n = len(s)
        while i < n and s[i] not in _V1:
            i += 1
        while i < n and s[i] in _V1:
            i += 1
        return i + 1 if i < n else n

    r1 = after_first_nonvowel_after_vowel(word, 0)
    r2 = after_first_nonvowel_after_vowel(word, r1)
    return r1, r2


def _ends_long(word: str) -> bool:
    return word[-2:] in _LONG


def stem(word: str) -> str:  # noqa: C901 — mirrors the spec's step list
    word = word.lower()
    r1, r2 = _regions(word)
    ending_removed = False

    # ---- step 1: particles etc (longest suffix in R1) ----
    for suf in ("kaan", "kään", "sti", "kin", "han", "hän", "ko", "kö",
                "pa", "pä"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            if suf == "sti":
                if len(word) - len(suf) >= r2:
                    word = word[: -len(suf)]
            else:
                prev = word[-len(suf) - 1: -len(suf)]
                if prev and prev in _PARTICLE_END:
                    word = word[: -len(suf)]
            break

    # ---- step 2: possessives (longest suffix in R1) ----
    for suf in ("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            stem_part = word[: -len(suf)]
            if suf == "si":
                if not stem_part.endswith("k"):
                    word = stem_part
            elif suf == "ni":
                word = stem_part
                if word.endswith("kse"):
                    word = word[:-1] + "i"
            elif suf in ("nsa", "nsä", "mme", "nne"):
                word = stem_part
            elif suf == "an":
                if stem_part.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                    word = stem_part
            elif suf == "än":
                if stem_part.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    word = stem_part
            elif suf == "en":
                if stem_part.endswith(("lle", "ine")):
                    word = stem_part
            break

    # ---- step 3: cases (longest suffix in R1) ----
    step3_sufs = sorted(
        list(_STEP3_HXN) + ["siin", "seen", "den", "tten", "tta", "ttä"]
        + list(_STEP3_PLAIN) + ["a", "ä", "n"],
        key=len, reverse=True,
    )
    for suf in step3_sufs:
        if not (word.endswith(suf) and len(word) - len(suf) >= r1):
            continue
        stem_part = word[: -len(suf)]
        if suf in _STEP3_HXN:
            # hXn: delete only when preceded by its own vowel X (condition
            # failure does NOT fall through to the shorter an/än/n forms)
            if stem_part.endswith(_STEP3_HXN[suf]):
                word = stem_part
                ending_removed = True
        elif suf in ("siin", "den", "tten"):
            # condition Vi: preceded by i preceded by a V2 vowel
            if stem_part.endswith("i") and len(stem_part) >= 2 \
                    and stem_part[-2] in _V2:
                word = stem_part
                ending_removed = True
        elif suf == "seen":
            if stem_part[-2:] in _LONG:
                word = stem_part
                ending_removed = True
        elif suf in ("tta", "ttä"):
            if stem_part.endswith("e"):
                word = stem_part
                ending_removed = True
        elif suf in _STEP3_PLAIN:
            word = stem_part
            ending_removed = True
        elif suf in ("a", "ä"):
            # preceded by cv: vowel just before, consonant before that
            if len(stem_part) >= 2 and stem_part[-1] in _V1 \
                    and stem_part[-2] not in _V1:
                word = stem_part
                ending_removed = True
        elif suf == "n":
            word = stem_part
            ending_removed = True
            if word[-2:] in _LONG or word.endswith("ie"):
                word = word[:-1]
        break

    # ---- step 4: other endings (longest suffix in R2) ----
    for suf in ("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä",
                "mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not word[: -len(suf)].endswith("po"):
                    word = word[: -len(suf)]
            else:
                word = word[: -len(suf)]
            break

    # ---- step 5: plurals ----
    if ending_removed:
        if word and word[-1] in "ij" and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if word.endswith("t") and len(word) - 1 >= r1 \
                and len(word) >= 2 and word[-2] in _V1:
            word = word[:-1]
            for suf in ("imma", "mma"):
                if word.endswith(suf) and len(word) - len(suf) >= r2:
                    if suf == "mma" and word[: -len(suf)].endswith("po"):
                        break
                    word = word[: -len(suf)]
                    break

    # ---- step 6: tidying up ----
    # a-d run under a hard R1 limit: both chars of each two-char test must
    # lie inside R1 (Snowball setlimit semantics — a test may not move
    # left of the mark)
    # a) undouble a final long vowel
    if len(word) >= 2 and len(word) - 2 >= r1 and word[-2:] in _LONG:
        word = word[:-1]
    # b) final a/ä/e/i after a consonant
    if len(word) >= 2 and len(word) - 2 >= r1 and word[-1] in _AEI \
            and word[-2] not in _V1:
        word = word[:-1]
    # c) final oj / uj
    if len(word) - 2 >= r1 and word.endswith(("oj", "uj")):
        word = word[:-1]
    # d) final jo
    if len(word) - 2 >= r1 and word.endswith("jo"):
        word = word[:-1]
    # e) not region-restricted: a double consonant followed by zero or
    # more vowels at the end loses its second member
    i = len(word)
    while i > 0 and word[i - 1] in _V1:
        i -= 1
    if i >= 2 and word[i - 1] == word[i - 2] and word[i - 1] not in _V1:
        word = word[: i - 1] + word[i:]
    return word

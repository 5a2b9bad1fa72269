"""Vendored pure-Python French Snowball stemmer.

The reference resolves ``stemmer="french"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:39`);
implemented here from the published algorithm (snowballstem.org "The
French stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.
"""

from __future__ import annotations

_VOWELS = "aeiouyâàëéêèïîôûù"

_STEP1_DELETE_R2 = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe", "isme",
    "able", "iste", "eux",
)
_STEP1_ATEUR = ("atrices", "atrice", "ateurs", "ations", "ateur", "ation")
_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "î", "i",
)
_STEP2B_RV = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "iez", "ées", "era", "és", "ez",
    "ée", "er", "é",
)
_STEP2B_E = (
    "assions", "assiez", "aIent", "antes", "asses", "âmes", "âtes",
    "ante", "ants", "asse", "ais", "ait", "ant", "assent", "as", "ai",
    "ât", "a",
)


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    # RV: after the third letter if the word begins with two vowels or with
    # par/col/tap; else after the first vowel not at position 0
    rv = n
    if n >= 3 and (
        (word[0] in _VOWELS and word[1] in _VOWELS)
        or word[:3] in ("par", "col", "tap")
    ):
        rv = 3
    else:
        for i in range(1, n):
            if word[i] in _VOWELS:
                rv = i + 1
                break
    return r1, r2, rv


def _mark(word: str) -> str:
    chars = list(word)
    n = len(chars)
    for i, c in enumerate(chars):
        prev_v = i > 0 and chars[i - 1] in _VOWELS
        next_v = i + 1 < n and chars[i + 1] in _VOWELS
        if c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def stem(word: str) -> str:  # noqa: PLR0912, PLR0915
    """Stem one word with the French Snowball algorithm (lowercases input)."""
    word = word.lower()
    if len(word) < 2:
        return word
    word = _mark(word)
    r1, r2, rv = _regions(word)

    original = word
    step1_ment = False  # ending amment/emment/ment/ments found in step 1

    # ---- Step 1: standard suffix removal (longest match) ----
    s1_all = sorted(
        set(_STEP1_DELETE_R2)
        | set(_STEP1_ATEUR)
        | {
            "logies", "logie", "usions", "utions", "usion", "ution",
            "ences", "ence", "ements", "ement", "ités", "ité", "ives",
            "ifs", "ive", "if", "eaux", "aux", "euses", "euse",
            "issements", "issement", "amment", "emment", "ments", "ment",
        },
        key=len,
        reverse=True,
    )
    for suf in s1_all:
        if not word.endswith(suf):
            continue
        base = len(word) - len(suf)
        if suf in _STEP1_DELETE_R2:
            if base >= r2:
                word = word[:base]
        elif suf in _STEP1_ATEUR:
            if base >= r2:
                word = word[:base]
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif suf in ("logies", "logie"):
            if base >= r2:
                word = word[:base] + "log"
        elif suf in ("usions", "utions", "usion", "ution"):
            if base >= r2:
                word = word[:base] + "u"
        elif suf in ("ences", "ence"):
            if base >= r2:
                word = word[:base] + "ent"
        elif suf in ("ements", "ement"):
            if base >= rv:
                word = word[:base]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= r2:
                        word = word[:-3]
                    elif len(word) - 3 >= r1:
                        word = word[:-3] + "eux"
                elif word.endswith(("abl", "iqU")) and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith(("ièr", "Ièr")) and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif suf in ("ités", "ité"):
            if base >= r2:
                word = word[:base]
                if word.endswith("abil"):
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("ives", "ifs", "ive", "if"):
            if base >= r2:
                word = word[:base]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        if len(word) - 2 >= r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif suf == "eaux":
            word = word[:base] + "eau"
        elif suf == "aux":
            if base >= r1:
                word = word[:base] + "al"
        elif suf in ("euses", "euse"):
            if base >= r2:
                word = word[:base]
            elif base >= r1:
                word = word[:base] + "eux"
        elif suf in ("issements", "issement"):
            if base >= r1 and base >= 1 and word[base - 1] not in _VOWELS:
                word = word[:base]
        elif suf == "amment":
            if base >= rv:
                word = word[:base] + "ant"
            step1_ment = True
        elif suf == "emment":
            if base >= rv:
                word = word[:base] + "ent"
            step1_ment = True
        else:  # ment ments
            if base >= 1 and base - 1 >= rv and word[base - 1] in _VOWELS:
                word = word[:base]
            step1_ment = True
        break

    do_2a = (word == original) or step1_ment

    # ---- Steps 2a / 2b: verb suffixes ----
    altered2 = False
    if do_2a:
        before2a = word
        for suf in sorted(_STEP2A, key=len, reverse=True):
            if word.endswith(suf):
                base = len(word) - len(suf)
                # delete if in RV and preceded by a non-vowel itself in RV
                if (
                    base >= rv
                    and base >= 1
                    and base - 1 >= rv
                    and word[base - 1] not in _VOWELS
                ):
                    word = word[:base]
                    altered2 = True
                break
        if not altered2:
            for suf in sorted(
                set(_STEP2B_RV) | set(_STEP2B_E) | {"ions"}, key=len, reverse=True
            ):
                if word.endswith(suf):
                    base = len(word) - len(suf)
                    if suf == "ions":
                        if base >= rv and base >= r2:
                            word = word[:base]
                            altered2 = True
                    elif suf in _STEP2B_RV:
                        if base >= rv:
                            word = word[:base]
                            altered2 = True
                    else:
                        if base >= rv:
                            word = word[:base]
                            altered2 = True
                            if word.endswith("e") and len(word) - 1 >= rv:
                                word = word[:-1]
                    break
        if before2a == word:
            altered2 = False

    # ---- Step 3 or step 4: "if the LAST step to be obeyed (1, 2a or 2b)
    # altered the word, do step 3, otherwise do step 4" ----
    last_altered = altered2 if do_2a else (word != original)
    if last_altered:
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # Step 4
        if (
            word.endswith("s")
            and len(word) >= 2
            and word[-2] not in "aiouès"
        ):
            word = word[:-1]
        for suf in ("ière", "Ière", "ion", "ier", "Ier", "e", "ë"):
            if word.endswith(suf):
                base = len(word) - len(suf)
                if suf == "ion":
                    if base >= r2 and base >= rv and base >= 1 and word[base - 1] in "st":
                        word = word[:base]
                elif suf in ("ière", "Ière", "ier", "Ier"):
                    if base >= rv:
                        word = word[:base] + "i"
                elif suf == "e":
                    if base >= rv:
                        word = word[:base]
                else:  # ë
                    if base >= rv and word[:base].endswith("gu"):
                        word = word[:base]
                break

    # ---- Step 5: undouble ----
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # ---- Step 6: un-accent ----
    i = len(word) - 1
    seen_cons = False
    while i >= 0 and word[i] not in _VOWELS:
        seen_cons = True
        i -= 1
    if seen_cons and i >= 0 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1 :]

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")

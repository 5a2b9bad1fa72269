"""Vendored pure-Python Italian Snowball stemmer.

The reference resolves ``stemmer="italian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:41`);
implemented here from the published algorithm (snowballstem.org "The
Italian stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

Preliminaries per the spec: acute accents are replaced by grave; ``u``
after ``q`` and ``u``/``i`` between vowels are marked as non-vowels
(uppercased internally, lowered again at the end).
"""

from __future__ import annotations

_VOWELS = "aeiouàèìòù"

_ACUTE = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene",
    "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
    "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
    "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
)

_STEP1_DELETE_R2 = (
    "atrice", "atrici", "abile", "abili", "ibile", "ibili", "mente",
    "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
    "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici", "ica",
    "ice", "oso", "osi", "osa", "ose",
)

_STEP2_VERB = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti", "iscano", "iscono", "issero", "arono", "avamo",
    "avano", "avate", "eremo", "erete", "erono", "evamo", "evano",
    "evate", "iremo", "irete", "irono", "ivamo", "ivano", "ivate",
    "ammo", "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
    "endo", "erai", "erei", "yamo", "iamo", "immo", "irai", "irei",
    "isca", "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati",
    "ato", "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva",
    "evi", "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito",
    "iva", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


def _mark(word: str) -> str:
    """Uppercase u after q and u/i between vowels (treated as non-vowels)."""
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


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
    rv = n
    if n > 3:
        if word[1] not in _VOWELS:
            for i in range(2, n):
                if word[i] in _VOWELS:
                    rv = i + 1
                    break
        elif word[0] in _VOWELS and word[1] in _VOWELS:
            for i in range(2, n):
                if word[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def _in(word: str, suffix: str, region: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= region


def _step0(word: str, rv: int) -> str:
    """Attached-pronoun removal (tests in RV)."""
    best = None
    for p in _PRONOUNS:
        if _in(word, p, rv) and (best is None or len(p) > len(best)):
            best = p
    if best is None:
        return word
    stem_part = word[: len(word) - len(best)]
    for pre in ("ando", "endo"):
        if _in(stem_part, pre, rv):
            return stem_part  # delete the pronoun
    for pre in ("ar", "er", "ir"):
        if _in(stem_part, pre, rv):
            return stem_part + "e"  # pronoun -> e
    return word


def _step1(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    candidates: list[tuple[str, str]] = [(s, "del_r2") for s in _STEP1_DELETE_R2]
    for s in ("azione", "azioni", "atore", "atori"):
        candidates.append((s, "azione"))
    for s in ("logia", "logie"):
        candidates.append((s, "logia"))
    for s in ("uzione", "uzioni", "usione", "usioni"):
        candidates.append((s, "uzione"))
    for s in ("enza", "enze"):
        candidates.append((s, "enza"))
    for s in ("amento", "amenti", "imento", "imenti"):
        candidates.append((s, "amento"))
    candidates.append(("amente", "amente"))
    candidates.append(("ità", "ita"))
    for s in ("ivo", "ivi", "iva", "ive"):
        candidates.append((s, "iv"))

    best = None
    for s, kind in candidates:
        if word.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, kind)
    if best is None:
        return word, False
    s, kind = best
    stem_part = word[: len(word) - len(s)]
    if kind == "del_r2":
        if _in(word, s, r2):
            return stem_part, True
    elif kind == "azione":
        if _in(word, s, r2):
            if _in(stem_part, "ic", r2):
                stem_part = stem_part[:-2]
            return stem_part, True
    elif kind == "logia":
        if _in(word, s, r2):
            return stem_part + "log", True
    elif kind == "uzione":
        if _in(word, s, r2):
            return stem_part + "u", True
    elif kind == "enza":
        if _in(word, s, r2):
            return stem_part + "ente", True
    elif kind == "amento":
        if _in(word, s, rv):
            return stem_part, True
    elif kind == "amente":
        if _in(word, s, r1):
            w = stem_part
            if _in(w, "iv", r2):
                w = w[:-2]
                if _in(w, "at", r2):
                    w = w[:-2]
            elif _in(w, "os", r2) or _in(w, "ic", r2) or _in(w, "abil", r2):
                w = w[: -4 if w.endswith("abil") else -2]
            return w, True
    elif kind == "ita":
        if _in(word, s, r2):
            w = stem_part
            for pre in ("abil", "ic", "iv"):
                if _in(w, pre, r2):
                    w = w[: len(w) - len(pre)]
                    break
            return w, True
    elif kind == "iv":
        if _in(word, s, r2):
            w = stem_part
            if _in(w, "at", r2):
                w = w[:-2]
                if _in(w, "ic", r2):
                    w = w[:-2]
            return w, True
    return word, False


def stem(word: str) -> str:
    word = word.translate(_ACUTE)
    word = _mark(word)
    r1, r2, rv = _regions(word)

    word = _step0(word, rv)
    w1, changed1 = _step1(word, r1, r2, rv)
    word = w1
    if not changed1:
        best = None
        for s in _STEP2_VERB:
            if _in(word, s, rv) and (best is None or len(s) > len(best)):
                best = s
        if best is not None:
            word = word[: len(word) - len(best)]

    # Step 3a: final vowel (and a preceding i) in RV
    if word and word[-1] in "aeioàèìò" and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]
    # Step 3b: ch/gh -> c/g in RV
    if (word.endswith("ch") or word.endswith("gh")) and len(word) - 2 >= rv:
        word = word[:-1]

    return word.lower()

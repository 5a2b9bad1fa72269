"""Vendored pure-Python Portuguese Snowball stemmer.

The reference resolves ``stemmer="portuguese"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:44`);
implemented here from the published algorithm (snowballstem.org "The
Portuguese stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

Like the spec, ``ã``/``õ`` are rewritten to the two-character sequences
``a~``/``o~`` up front (the nasal vowel counts as vowel + consonant for
region computation) and restored at the end.
"""

from __future__ import annotations

_VOWELS = "aeiouáéíóúâêô"

_STEP1_DELETE_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores", "aço~es",
    "ismos", "istas", "ância", "ezas", "adora", "aça~o", "antes", "ante",
    "eza", "icos", "icas", "ismo", "ável", "ível", "ista", "osos", "osas",
    "ador", "ico", "ica", "oso", "osa",
)

# official spec list, verbatim (a~/o~ spelling for nasal vowels)
_STEP2_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "ado", "ido", "ando", "endo",
    "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes", "istes",
    "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis", "áreis",
    "areis", "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis",
    "ísseis", "áveis", "ados", "idos", "ámos", "amos", "íamos",
    "aríamos", "eríamos", "iríamos", "áramos", "éramos", "íramos",
    "ávamos", "emos", "aremos", "eremos", "iremos", "ássemos",
    "êssemos", "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu",
    "ou", "ira", "iras",
)

_STEP4_RESIDUAL = ("os", "a", "i", "o", "á", "í", "ó")


def _regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv) — r1/r2 standard; rv per the Spanish/Portuguese rule."""
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
            # consonant in 2nd position: after the next following vowel
            for i in range(2, n):
                if word[i] in _VOWELS:
                    rv = i + 1
                    break
        elif word[0] in _VOWELS and word[1] in _VOWELS:
            # two initial vowels: after the next consonant
            for i in range(2, n):
                if word[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def _in(word: str, suffix: str, region: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= region


def _step1(word: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    """Standard suffix removal; returns (word, changed)."""
    candidates: list[tuple[str, str]] = []
    for s in _STEP1_DELETE_R2:
        candidates.append((s, "del_r2"))
    for s in ("logias", "logia"):
        candidates.append((s, "logia"))
    for s in ("uço~es", "uça~o"):
        candidates.append((s, "ucao"))
    for s in ("ências", "ência"):
        candidates.append((s, "encia"))
    candidates.append(("amente", "amente"))
    candidates.append(("mente", "mente"))
    for s in ("idades", "idade"):
        candidates.append((s, "idade"))
    for s in ("ivas", "ivos", "iva", "ivo"):
        candidates.append((s, "iv"))
    for s in ("iras", "ira"):
        candidates.append((s, "ira"))

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
    elif kind == "logia":
        if _in(word, s, r2):
            return stem_part + "log", True
    elif kind == "ucao":
        if _in(word, s, r2):
            return stem_part + "u", True
    elif kind == "encia":
        if _in(word, s, r2):
            return stem_part + "ente", True
    elif kind == "amente":
        if _in(word, s, r1):
            w = stem_part
            if _in(w, "iv", r2):
                w = w[:-2]
                if _in(w, "at", r2):
                    w = w[:-2]
            elif _in(w, "os", r2) or _in(w, "ic", r2) or _in(w, "ad", r2):
                w = w[:-2]
            return w, True
    elif kind == "mente":
        if _in(word, s, r2):
            w = stem_part
            for pre in ("ante", "avel", "ível"):
                if _in(w, pre, r2):
                    w = w[: len(w) - len(pre)]
                    break
            return w, True
    elif kind == "idade":
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
            return w, True
    elif kind == "ira":
        # replace with ir if in RV and preceded by e
        if _in(word, s, rv) and stem_part.endswith("e"):
            return stem_part + "ir", True
    return word, False


def stem(word: str) -> str:
    word = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2, rv = _regions(word)

    w1, changed1 = _step1(word, r1, r2, rv)
    word = w1
    changed2 = False
    if not changed1:
        best = None
        for s in _STEP2_VERB:
            if _in(word, s, rv) and (best is None or len(s) > len(best)):
                best = s
        if best is not None:
            word = word[: len(word) - len(best)]
            changed2 = True

    if changed1 or changed2:
        # Step 3: final i preceded by c, in RV
        if _in(word, "i", rv) and word.endswith("ci"):
            word = word[:-1]
    else:
        # Step 4: residual suffix
        for s in _STEP4_RESIDUAL:
            if _in(word, s, rv):
                word = word[: len(word) - len(s)]
                break

    # Step 5: residual form
    if _in(word, "e", rv) or _in(word, "é", rv) or _in(word, "ê", rv):
        word = word[:-1]
        if (word.endswith("gu") and _in(word, "u", rv)) or (
            word.endswith("ci") and _in(word, "i", rv)
        ):
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")

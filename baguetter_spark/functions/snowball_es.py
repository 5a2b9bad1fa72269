"""Vendored pure-Python Spanish Snowball stemmer.

The reference resolves ``stemmer="spanish"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:45`);
implemented here from the published algorithm (snowballstem.org "The
Spanish stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.
"""

from __future__ import annotations

_VOWELS = "aeiouáéíóúü"

_ACCENT_MAP = str.maketrans("áéíóú", "aeiou")

_STEP0_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_STEP0_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")  # accent removed after
_STEP0_PRE_B = ("iendo", "ando", "ar", "er", "ir")

_STEP1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_STEP1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora", "ación",
               "antes", "ancia", "ador", "ante")
_STEP2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
           "ya", "ye", "yo", "yó")
_STEP2B_GU = ("emos", "éis", "en", "es")
_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
    "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
    "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
    "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís",
)


def _regions(word: str) -> tuple[int, int, int]:
    """(r1, r2, rv) per the Spanish/French region definitions."""
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
    if n >= 3:
        if word[1] not in _VOWELS:
            # consonant in second position: after the next following vowel
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
            # consonant-vowel: after the third letter
            rv = 3
    return r1, r2, rv


def stem(word: str) -> str:  # noqa: PLR0912, PLR0915
    """Stem one word with the Spanish Snowball algorithm (lowercases input)."""
    word = word.lower()
    if len(word) < 2:
        return word
    r1, r2, rv = _regions(word)

    # Step 0: attached pronoun
    for pron in _STEP0_PRONOUNS:
        if word.endswith(pron):
            base = word[: -len(pron)]
            matched = False
            for pre in _STEP0_PRE_A:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    word = base[: -len(pre)] + pre.translate(_ACCENT_MAP)
                    matched = True
                    break
            if not matched:
                for pre in _STEP0_PRE_B:
                    if base.endswith(pre) and len(base) - len(pre) >= rv:
                        word = base
                        matched = True
                        break
            if not matched and base.endswith("yendo") and base[: -5].endswith("u"):
                if len(base) - 5 >= rv:
                    word = base
            break

    altered1 = False
    # Step 1: standard suffix removal (longest match over ALL step-1 suffixes)
    s1_all = sorted(
        set(_STEP1_DELETE_R2) | set(_STEP1_ADOR)
        | {"logías", "logía", "uciones", "ución", "encias", "encia",
           "amente", "mente", "idades", "idad", "ivas", "ivos", "iva", "ivo"},
        key=len,
        reverse=True,
    )
    for suf in s1_all:
        if word.endswith(suf):
            base = len(word) - len(suf)
            if suf in _STEP1_DELETE_R2:
                if base >= r2:
                    word = word[:base]
                    altered1 = True
            elif suf in _STEP1_ADOR:
                if base >= r2:
                    word = word[:base]
                    altered1 = True
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]
            elif suf in ("logías", "logía"):
                if base >= r2:
                    word = word[:base] + "log"
                    altered1 = True
            elif suf in ("uciones", "ución"):
                if base >= r2:
                    word = word[:base] + "u"
                    altered1 = True
            elif suf in ("encias", "encia"):
                if base >= r2:
                    word = word[:base] + "ente"
                    altered1 = True
            elif suf == "amente":
                if base >= r1:
                    word = word[:base]
                    altered1 = True
                    if word.endswith("iv") and len(word) - 2 >= r2:
                        word = word[:-2]
                        if word.endswith("at") and len(word) - 2 >= r2:
                            word = word[:-2]
                    else:
                        for pre in ("os", "ic", "ad"):
                            if word.endswith(pre) and len(word) - 2 >= r2:
                                word = word[:-2]
                                break
            elif suf == "mente":
                if base >= r2:
                    word = word[:base]
                    altered1 = True
                    for pre in ("ante", "able", "ible"):
                        if word.endswith(pre) and len(word) - 4 >= r2:
                            word = word[:-4]
                            break
            elif suf in ("idades", "idad"):
                if base >= r2:
                    word = word[:base]
                    altered1 = True
                    for pre in ("abil", "ic", "iv"):
                        if word.endswith(pre) and len(word) - len(pre) >= r2:
                            word = word[: -len(pre)]
                            break
            else:  # iva ivo ivas ivos
                if base >= r2:
                    word = word[:base]
                    altered1 = True
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
            break

    if not altered1:
        # Step 2a: verb suffixes beginning y, preceded by u
        altered2a = False
        for suf in sorted(_STEP2A, key=len, reverse=True):
            if word.endswith(suf):
                base = len(word) - len(suf)
                if base >= rv and base >= 1 and word[base - 1] == "u":
                    word = word[:base]
                    altered2a = True
                break
        if not altered2a:
            # Step 2b: other verb suffixes
            for suf in sorted(set(_STEP2B) | set(_STEP2B_GU), key=len, reverse=True):
                if word.endswith(suf):
                    base = len(word) - len(suf)
                    if base >= rv:
                        word = word[:base]
                        if suf in _STEP2B_GU and word.endswith("gu"):
                            word = word[:-1]  # the u need not be in RV
                    break

    # Step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if word.endswith(suf):
            base = len(word) - len(suf)
            if base >= rv:
                word = word[:base]
                if suf in ("e", "é") and word.endswith("gu") and len(word) - 1 >= rv:
                    word = word[:-1]
            break

    return word.translate(_ACCENT_MAP)

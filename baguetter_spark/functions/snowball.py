"""Vendored pure-Python English Snowball stemmer (Porter2).

The reference resolves ``stemmer="english"`` to NLTK's
``SnowballStemmer("english")`` (`baguetter/indices/sparse/text_preprocessor/
stemmer.py:15-48`); NLTK is not installable offline, so we implement the
published Porter2 algorithm (snowballstem.org "The English (Porter2) stemming
algorithm", public spec) from scratch.  Behavior is checked against the
algorithm's documented sample vocabulary in tests.
"""

from __future__ import annotations

_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = "cdeghkmnrt"

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    {"inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"}
)

_R1_PREFIXES = ("gener", "commun", "arsen")


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _compute_r1_r2(word: str) -> tuple[int, int]:
    r1 = len(word)
    for prefix in _R1_PREFIXES:
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, len(word)):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable (per the spec)."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # vowel followed by non-vowel other than w, x, Y, preceded by non-vowel
        c1, c2, c3 = word[n - 3], word[n - 2], word[n - 1]
        return (
            c2 in _VOWELS
            and c3 not in _VOWELS
            and c3 not in "wxY"
            and c1 not in _VOWELS
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, start: int, end: int) -> bool:
    return any(word[i] in _VOWELS for i in range(start, end))


def stem(word: str) -> str:
    """Stem one word with the English (Porter2) algorithm.

    Matches NLTK ``SnowballStemmer("english").stem`` semantics: input is
    lowercased; words of length <= 2 are returned unchanged.
    """
    word = word.lower()
    if len(word) <= 2:
        return word

    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    if len(word) <= 2:
        return word

    # Mark y's that behave as consonants as 'Y'
    if word.startswith("y"):
        word = "Y" + word[1:]
    word = "".join(
        "Y" if c == "y" and i > 0 and word[i - 1] in _VOWELS else c
        for i, c in enumerate(word)
    )

    r1, r2 = _compute_r1_r2(word)

    # Step 0: longest of ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) - 3 > 1 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _has_vowel(word, 0, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part, 0, len(stem_part)):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (longest suffix; condition: suffix in R1)
    step2_rules = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("fulness", "ful"),
        ("tional", "tion"),
        ("biliti", "ble"),
        ("lessli", "less"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
        ("ogi", "og"),
        ("li", ""),
    )
    for suf, repl in step2_rules:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if len(word) > 3 and word[-4] == "l":
                        word = word[:-3] + repl
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (suffix in R1; "ative" additionally requires R2)
    step3_rules = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ative", ""),
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, repl in step3_rules:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (suffix in R2)
    step4_suffixes = (
        "ement",
        "ance",
        "ence",
        "able",
        "ible",
        "ment",
        "ant",
        "ent",
        "ism",
        "ate",
        "iti",
        "ous",
        "ive",
        "ize",
        "ion",
        "al",
        "er",
        "ic",
    )
    for suf in step4_suffixes:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
        word = word[:-1]

    return word.replace("Y", "y")


def get_stemmer(name: str | None):
    """Resolve a stemmer name (mirrors reference ``get_stemmer``,
    stemmer.py:51-90; the vendored languages cover the reference registry's
    most-used Snowball entries — others need native nltk/PyStemmer and
    raise offline)."""
    if name is None:
        return None
    n = name.lower()
    if n in ("english", "en", "porter2", "snowball"):
        return stem
    if n in ("german", "de"):
        from baguetter_spark.functions.snowball_de import stem as stem_de

        return stem_de
    if n in ("french", "fr"):
        from baguetter_spark.functions.snowball_fr import stem as stem_fr

        return stem_fr
    if n in ("spanish", "es"):
        from baguetter_spark.functions.snowball_es import stem as stem_es

        return stem_es
    if n in ("russian", "ru"):
        from baguetter_spark.functions.snowball_ru import stem as stem_ru

        return stem_ru
    if n in ("portuguese", "pt"):
        from baguetter_spark.functions.snowball_pt import stem as stem_pt

        return stem_pt
    if n in ("italian", "it"):
        from baguetter_spark.functions.snowball_it import stem as stem_it

        return stem_it
    if n in ("dutch", "nl"):
        from baguetter_spark.functions.snowball_nl import stem as stem_nl

        return stem_nl
    if n in ("swedish", "sv"):
        from baguetter_spark.functions.snowball_scandi import stem_sv

        return stem_sv
    if n in ("norwegian", "no"):
        from baguetter_spark.functions.snowball_scandi import stem_no

        return stem_no
    if n in ("danish", "da"):
        from baguetter_spark.functions.snowball_scandi import stem_da

        return stem_da
    if n in ("romanian", "ro"):
        from baguetter_spark.functions.snowball_ro import stem as stem_ro

        return stem_ro
    if n in ("hungarian", "hu"):
        from baguetter_spark.functions.snowball_hu import stem as stem_hu

        return stem_hu
    if n == "porter":
        from baguetter_spark.functions.porter import stem as stem_porter

        return stem_porter
    if n in ("finnish", "fi"):
        from baguetter_spark.functions.snowball_fi import stem as stem_fi

        return stem_fi
    if n == "lancaster":
        from baguetter_spark.functions.lancaster import stem as stem_lancaster

        return stem_lancaster
    if n == "cistem":
        from baguetter_spark.functions.cistem import stem as stem_cistem

        return stem_cistem
    if n in ("indonesian", "id"):
        from baguetter_spark.functions.snowball_id import stem as stem_id

        return stem_id
    if n in ("hindi", "hi"):
        from baguetter_spark.functions.snowball_hi import stem as stem_hi

        return stem_hi
    if n in ("turkish", "tr"):
        from baguetter_spark.functions.snowball_tr import stem as stem_tr

        return stem_tr
    if n in ("arabic", "ar"):
        from baguetter_spark.functions.snowball_ar import stem as stem_ar

        return stem_ar
    if n in ("catalan", "ca"):
        from baguetter_spark.functions.snowball_ca import stem as stem_ca

        return stem_ca
    if n in ("nepali", "ne"):
        from baguetter_spark.functions.snowball_ne import stem as stem_ne

        return stem_ne
    if n in ("irish", "ga"):
        from baguetter_spark.functions.snowball_ga import stem as stem_ga

        return stem_ga
    if n in ("lithuanian", "lt"):
        from baguetter_spark.functions.snowball_lt import stem as stem_lt

        return stem_lt
    if n in ("basque", "eu"):
        from baguetter_spark.functions.snowball_eu import stem as stem_eu

        return stem_eu
    if n in ("greek", "el"):
        from baguetter_spark.functions.snowball_el import stem as stem_el

        return stem_el
    if n in ("tamil", "ta"):
        from baguetter_spark.functions.snowball_ta import stem as stem_ta

        return stem_ta
    if n == "isri":
        from baguetter_spark.functions.isri import stem as stem_isri

        return stem_isri
    if n == "arlstem":
        from baguetter_spark.functions.arlstem import stem as stem_arlstem

        return stem_arlstem
    if n == "arlstem2":
        from baguetter_spark.functions.arlstem import stem2 as stem_arlstem2

        return stem_arlstem2
    if n in ("krovetz", "kstem"):
        # Dictionary-less projection of KStem: the derivational steps are
        # lexicon-gated in the published algorithm (restore-on-miss), so
        # with no lexicon the inflectional cascade IS the algorithm; see
        # functions/kstem.py module doc for the documented divergences.
        from baguetter_spark.functions.kstem import stem as stem_kstem

        return stem_kstem
    msg = (
        f"Stemmer {name!r} not supported offline (vendored: english, german, "
        f"french, spanish, russian, portuguese, italian, dutch, swedish, "
        f"norwegian, danish, romanian, finnish, hungarian, indonesian, "
        f"hindi, turkish, arabic, catalan, nepali, irish, lithuanian, "
        f"basque, greek, tamil, porter, lancaster, cistem, isri, arlstem, "
        f"arlstem2, krovetz)."
    )
    raise ValueError(msg)

"""Vendored pure-Python Lancaster (Paice/Husk) stemmer.

The reference registers ``stemmer="lancaster"`` via
``nltk.stem.LancasterStemmer().stem``
(`baguetter/indices/sparse/text_preprocessor/stemmer.py:18`); implemented
here from the published algorithm (Paice 1990, "Another stemmer", SIGIR
Forum 24(3) — public spec) with the paper's standard rule table.  Golden
pairs in tests are hand-traced through the table.

Rule encoding (as published): ``<reversed-ending>[*]<remove-count>[append]<cont>``
where ``*`` requires the word to be still intact (unmodified by any prior
rule), the digit is how many final chars to delete, the optional append
string is added after deletion, and the final char is ``>`` (continue
stemming the result) or ``.`` (stop).

Acceptability (paper section 3): a stemmed candidate is rejected unless
- it starts with a vowel and keeps >= 2 letters, or
- it starts with a consonant, keeps >= 3 letters, and at least one of them
  is a vowel or ``y``.
"""

from __future__ import annotations

# The published default rule table (Paice 1990, Appendix A).
_RULE_TUPLE = (
    "ai*2.", "a*1.",
    "bb1.",
    "city3s.", "ci2>", "cn1t>",
    "dd1.", "dei3y>", "deec2ss.", "dee1.", "de2>", "dooh4>",
    "e1>",
    "feil1v.", "fi2>",
    "gni3>", "gai3y.", "ga2>", "gg1.",
    "ht*2.", "hsiug5ct.", "hsi3>",
    "i*1.", "i1y>",
    "ji1d.", "juf1s.", "ju1d.", "jo1d.", "jeh1r.", "jrev1t.", "jsim2t.",
    "jn1d.", "j1s.",
    "lbaifi6.", "lbai4y.", "lba3>", "lbi3.", "lib2l>", "lc1.", "lufi4y.",
    "luf3>", "lu2.", "lai3>", "lau3>", "la2>", "ll1.",
    "mui3.", "mu*2.", "msi3>", "mm1.",
    "nois4j>", "noix4ct.", "noi3>", "nai3>", "na2>", "nee0.", "ne2>", "nn1.",
    "pihs4>", "pp1.",
    "re2>", "rae0.", "ra2.", "ro2>", "ru2>", "rr1.", "rt1>", "rei3y>",
    "sei3y>", "sis2.", "si2>", "ssen4>", "ss0.", "suo3>", "su*2.", "s*1>",
    "s0.",
    "tacilp4c.", "ta2>", "tnem4>", "tne3>", "tna3>", "tpir2b.", "tpro2b.",
    "tcud1.", "tpmus2.", "tpec2iv.", "tulo2v.", "tsis0.", "tsi3>", "tt1.",
    "uqi3.", "ugo1.",
    "vis3j>", "vie0.", "vi2>",
    "ylb1>", "yli3y>", "ylp0.", "yl2>", "ygo1.", "yhp1.", "ymo1.", "ypo1.",
    "yti3>", "yte3>", "ytl2.", "yrtsi5.", "yra3>", "yro3>", "yfi3.",
    "ycn2t>", "yca3>",
    "zi2>", "zy1s.",
)

_VOWELS = "aeiou"


def _parse(rule: str) -> tuple[str, bool, int, str, bool]:
    """-> (ending, intact_only, remove_count, append, cont)."""
    i = 0
    while rule[i].isalpha():
        i += 1
    ending = rule[:i][::-1]
    intact = rule[i] == "*"
    if intact:
        i += 1
    remove = int(rule[i])
    i += 1
    j = i
    while rule[j].isalpha():
        j += 1
    append = rule[i:j]
    cont = rule[j] == ">"
    return ending, intact, remove, append, cont


_RULES: dict[str, list[tuple[str, bool, int, str, bool]]] = {}
for _r in _RULE_TUPLE:
    _RULES.setdefault(_r[0], []).append(_parse(_r))


def _acceptable(word: str) -> bool:
    if not word:
        return False
    if word[0] in _VOWELS:
        return len(word) >= 2
    return len(word) >= 3 and any(c in _VOWELS or c == "y" for c in word)


def stem(word: str) -> str:
    word = word.lower()
    if not word.isalpha():
        # mirror the rule engine's letter-only domain: leave tokens with
        # digits/punctuation untouched (rules only ever match letters)
        return word
    intact = True
    while word:
        section = _RULES.get(word[-1])
        if not section:
            break
        applied = False
        for ending, need_intact, remove, append, cont in section:
            if need_intact and not intact:
                continue
            if not word.endswith(ending):
                continue
            if remove > len(word):
                continue
            candidate = word[: len(word) - remove] + append
            if not _acceptable(candidate):
                continue
            word = candidate
            intact = False
            applied = True
            if not cont:
                return word
            break
        if not applied:
            break
    return word

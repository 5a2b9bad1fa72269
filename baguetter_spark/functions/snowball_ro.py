"""Vendored pure-Python Romanian Snowball stemmer.

The reference resolves ``stemmer="romanian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:45`);
implemented here from the published algorithm (snowballstem.org "The
Romanian stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text.

Spec conventions followed:

- vowels are ``a ă â e i î o u``;
- ``i``/``u`` between vowels are uppercased (treated as consonants) before
  stemming and restored afterwards;
- the spec is written with cedilla forms ``ş``/``ţ`` (U+015F/U+0163); the
  modern comma-below forms ``ș``/``ț`` (U+0219/U+021B) are normalized to
  the cedilla forms up front, matching current Snowball behavior;
- R1/R2 standard; RV as in the Spanish/Portuguese family.
"""

from __future__ import annotations

_VOWELS = "aăâeiîou"

# ---- step 0: removal of plurals (and other simplifications), in R1 ----
# (suffix, replacement); "" = delete.  Longest match wins.
_STEP0 = (
    ("iilor", "i"), ("ului", ""), ("elor", "e"), ("iile", "i"),
    ("atei", "at"), ("aţie", "aţi"), ("aţia", "aţi"),
    ("aua", "a"), ("ele", "e"), ("iua", "i"), ("iei", "i"),
    ("ile", "i"),  # special: only if not preceded by "ab"
    ("ilor", "i"),
    ("ul", ""), ("ea", "e"), ("ii", "i"),
)

# ---- step 1: reduction of combining suffixes, in R1, repeated ----
_STEP1 = (
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"), ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"), ("icităţi", "ic"),
    ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("icivă", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("ical", "ic"), ("icală", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("ativ", "at"), ("ativă", "at"), ("ative", "at"), ("ativi", "at"),
    ("aţiune", "at"), ("atoare", "at"), ("ator", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itivă", "it"), ("itive", "it"), ("itivi", "it"),
    ("iţiune", "it"), ("itoare", "it"), ("itor", "it"), ("itori", "it"),
)

# ---- step 2: removal of standard suffixes, in R2 ----
_STEP2_DELETE = (
    "abilităi", "abilităţi", "abilitati", "abilitate",
    "ibilitate",
    "ivităi", "ivităţi", "ivitati", "ivitate",
    "icităi", "icităţi", "icitati", "icitate", "icatori", "icator",
    "oasă", "oasa", "oase",
    "itate", "itati", "ităi", "ităţi",
    "abila", "abile", "abili", "abilă", "abil",
    "ibila", "ibile", "ibili", "ibilă", "ibil",
    "atori", "ator", "antă", "anta", "ante", "anti", "ant",
    "ică", "ica", "ice", "ici", "ic",
    "ată", "ata", "ati", "ate", "at",
    "ută", "uta", "uti", "ute", "ut",
    "ită", "ita", "iti", "ite", "it",
    "ivă", "iva", "ive", "ivi", "iv",
    "oşi", "osi", "os",
)
_STEP2_IST = ("isme", "ism", "ista", "iste", "isti", "istă", "işti", "ist")


def _norm(word: str) -> str:
    return word.replace("ș", "ş").replace("ț", "ţ")


def _mark_iu(word: str) -> str:
    """i/u between vowels -> I/U (consonant role)."""
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "iu"
            and chars[i - 1] in _VOWELS
            and chars[i + 1].lower() in _VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS  # I/U uppercase are consonants by construction


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    rv = n
    if n > 3:
        if not _is_vowel(word[1]):
            for i in range(2, n):
                if _is_vowel(word[i]):
                    rv = i + 1
                    break
        elif _is_vowel(word[0]) and _is_vowel(word[1]):
            for i in range(2, n):
                if not _is_vowel(word[i]):
                    rv = i + 1
                    break
        else:
            rv = 3
    return r1, r2, rv


def _in(word: str, suffix: str, region: int) -> bool:
    return word.endswith(suffix) and len(word) - len(suffix) >= region


# ---- step 3: removal of verb suffixes, in RV ----
# Group A: delete only if preceded (in RV) by a consonant or "u".
_STEP3_COND = (
    "seserăţi", "iserăţi", "âserăţi", "userăţi",
    "seserăm", "iserăm", "âserăm", "userăm",
    "serăţi", "sesem", "seseşi", "serăm",
    "iseră", "âseră", "useră", "iseşi", "âseşi", "useşi",
    "isem", "âsem", "usem", "seşi", "seră",
    "sese", "ise", "âse", "use",
    "eşti", "eşte", "ăşti", "ăşte",
    "ează", "ezi", "ez",
    "ăsc", "ască", "esc", "ească",
    "are", "ere", "ire", "âre",
    "ind", "ând", "indu", "ându",
    "eze",
    "aţi", "eţi", "iţi", "âţi",
    "sei",
    "ăm", "em", "im", "âm",
    "se",
)
# Group B: always delete (in RV).  The spec splits the verb paradigm into
# the conditional group above (endings that attach to consonant/u-final
# stems) and this unconditional group of person/tense endings.
_STEP3_ALWAYS = (
    "aserăţi", "aserăm", "aseşi", "aseră", "asem", "ase",
    "arăţi", "arăm", "aşi", "ară", "ai", "au", "am",
    "eai", "eau", "eam", "eaţi",
    "iai", "iau", "iam", "iaţi",
    "ui", "uşi",
    "âi", "âşi",
    "irăţi", "irăm", "işi", "iră", "ii",
    "urăţi", "urăm", "ură",
    "ârăţi", "ârăm", "âră",
    "at", "ut", "it", "ât",  # past participles when verbal (RV)
)

_STEP4_FINAL = ("ie", "a", "e", "i", "ă")


def _step0(word: str, r1: int) -> tuple[str, bool]:
    for suf, rep in sorted(_STEP0, key=lambda x: -len(x[0])):
        if _in(word, suf, r1):
            if suf == "ile" and word.endswith("abile"):
                # "ile" not removed when preceded by "ab"
                continue
            return word[: -len(suf)] + rep, True
    return word, False


def _step1(word: str, r1_of) -> tuple[str, bool]:
    changed = False
    while True:
        hit = False
        r1, _, _ = r1_of(word)
        for suf, rep in sorted(_STEP1, key=lambda x: -len(x[0])):
            if _in(word, suf, r1):
                word = word[: -len(suf)] + rep
                hit = changed = True
                break
        if not hit:
            return word, changed


def _step2(word: str, r2: int) -> tuple[str, bool]:
    cands: list[tuple[str, str]] = []
    for suf in _STEP2_DELETE:
        cands.append((suf, ""))
    for suf in _STEP2_IST:
        cands.append((suf, "ist"))
    cands.append(("ţiune", "__TIUNE__"))
    cands.append(("ţiuni", "__TIUNE__"))
    for suf, rep in sorted(cands, key=lambda x: -len(x[0])):
        if suf.startswith("ţiun"):
            # iune/iuni deleted if in R2 and preceded by ţ, ţ -> t
            if word.endswith(suf) and len(word) - 4 >= r2:
                return word[: -len(suf)] + "t", True
            continue
        if _in(word, suf, r2):
            return word[: -len(suf)] + rep, True
    return word, False


def _step3(word: str, rv: int) -> str:
    best: tuple[int, str, bool] | None = None  # (len, suffix, conditional)
    for suf in _STEP3_COND:
        if _in(word, suf, rv) and (best is None or len(suf) > best[0]):
            best = (len(suf), suf, True)
    for suf in _STEP3_ALWAYS:
        if _in(word, suf, rv) and (best is None or len(suf) > best[0]):
            best = (len(suf), suf, False)
    if best is None:
        return word
    _, suf, cond = best
    if cond:
        prev = len(word) - len(suf) - 1
        # "preceded by a consonant or u" — and the preceding char must lie
        # in RV too (the whole pattern is matched inside RV)
        if prev < rv or prev < 0:
            return word
        ch = word[prev]
        if _is_vowel(ch) and ch != "u":
            return word
    return word[: -len(suf)]


def _step4(word: str, rv: int) -> str:
    for suf in sorted(_STEP4_FINAL, key=len, reverse=True):
        if _in(word, suf, rv):
            return word[: -len(suf)]
    return word


def stem(word: str) -> str:
    """Stem one lowercase Romanian word."""
    word = _norm(word)
    if len(word) <= 2:
        return word
    word = _mark_iu(word)
    r1, r2, rv = _regions(word)

    word, _ = _step0(word, r1)
    word, ch1 = _step1(word, lambda w: _regions(w))
    r1, r2, rv = _regions(word)
    word, ch2 = _step2(word, r2)
    if not (ch1 or ch2):
        r1, r2, rv = _regions(word)
        word = _step3(word, rv)
    r1, r2, rv = _regions(word)
    word = _step4(word, rv)
    return word.replace("I", "i").replace("U", "u")

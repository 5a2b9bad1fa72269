"""Vendored pure-Python ISRI Arabic root-extraction stemmer.

The reference registers ``stemmer="isri"`` via nltk's ISRIStemmer
(`baguetter/indices/sparse/text_preprocessor/stemmer.py:22`); nltk is not
installable offline, so this module implements the published algorithm
directly (Taghva, Elkhoury & Coombs, "Arabic Stemming Without A Root
Dictionary", ITCC 2005): diacritic normalization, longest-first affix
stripping, then morphological-pattern root extraction for 4-7 letter
words.  The affix and pattern tables below are the paper's.  Golden pairs
in tests are hand-traced through these tables.

Two deliberate deviations from nltk's port, both documented here:

- no built-in stop-word bypass list — the engine's preprocessor applies
  stopword removal as its own pipeline stage (T8), so baking a second,
  different list into the stemmer would double-filter inconsistently;
- total on arbitrary unicode — non-Arabic tokens pass through unchanged
  (a stemmer exception inside the tokenize UDF would fail the Spark task).
"""

from __future__ import annotations

# harakat + Quranic annotation range stripped by normalization
_DIACRITICS = frozenset(
    "ًٌٍَُِّْ"
    "ٰٕٖٓٔٗ٘ـ"  # incl. tatweel
)

_HAMZATED_ALIF = {"آ": "ا", "أ": "ا", "إ": "ا"}

# affix tables (paper, Table 1)
_P3 = ("كال", "بال",
       "ولل", "وال")  # كال بال ولل وال
_P2 = ("ال", "لل")  # ال لل
_P1 = ("ل", "ب", "ف", "س", "و",
       "ي", "ت", "ن", "ا")  # ل ب ف س و ي ت ن ا
_S3 = ("تمل", "همل", "تان",
       "تين", "كمل")  # تمل همل تان تين كمل
_S2 = ("ون", "ات", "ان", "ين",
       "تن", "كم", "هن", "نا",
       "يا", "ها", "تم", "كن",
       "ني", "وا", "ما", "هم")
_S1 = ("ة", "ه", "ي", "ك",
       "ت", "ا", "ن")  # ة ه ي ك ت ا ن

# pattern letter sets for 4-letter words, by position (paper, Table 2)
_PR4 = (("م",), ("ا",),
        ("ا", "و", "ي"), ("ة",))
# pattern letter sets used by the 5-letter matcher
_PR53 = (("ا", "ت"), ("ا", "ي", "و"),
         ("ا", "ت", "م"), ("م", "ي", "ت"),
         ("م", "ت"), ("ا", "و"), ("ا", "م"))

_ALIF = "ا"
_WAW = "و"
_YA = "ي"
_TA = "ت"
_MIM = "م"
_NUN = "ن"
_TA_MARBUTA = "ة"
_HAMZA_YA = "ئ"  # ئ


def _norm_diacritics(word: str) -> str:
    return "".join(ch for ch in word if ch not in _DIACRITICS)


def _norm_hamza(word: str) -> str:
    return "".join(_HAMZATED_ALIF.get(ch, ch) for ch in word)


def _pre32(word: str) -> str:
    """Strip one length-3 (>=6 letters) else length-2 (>=5) prefix."""
    if len(word) >= 6:
        for p in _P3:
            if word.startswith(p):
                return word[3:]
    if len(word) >= 5:
        for p in _P2:
            if word.startswith(p):
                return word[2:]
    return word


def _suf32(word: str) -> str:
    """Strip one length-3 (>=6 letters) else length-2 (>=5) suffix."""
    if len(word) >= 6:
        for s in _S3:
            if word.endswith(s):
                return word[:-3]
    if len(word) >= 5:
        for s in _S2:
            if word.endswith(s):
                return word[:-2]
    return word


def _waw(word: str) -> str:
    """Strip the leading conjunction و when it doubles a stem-initial و."""
    if len(word) >= 4 and word.startswith(_WAW + _WAW):
        return word[1:]
    return word


def _suf1(word: str) -> str:
    for s in _S1:
        if word.endswith(s):
            return word[:-1]
    return word


def _pre1(word: str) -> str:
    for p in _P1:
        if word.startswith(p):
            return word[1:]
    return word


def _pro_w4(word: str) -> str:
    """4-letter word -> 3-letter root via the paper's length-4 patterns."""
    if word[0] in _PR4[0]:      # مفعل
        return word[1:]
    if word[1] in _PR4[1]:      # فاعل
        return word[0] + word[2:]
    if word[2] in _PR4[2]:      # فعال فعول فعيل
        return word[:2] + word[3]
    if word[3] in _PR4[3]:      # فعلة
        return word[:-1]
    word = _suf1(word)
    if len(word) == 4:
        word = _pre1(word)
    return word


def _pro_w53(word: str) -> str:
    """5-letter word -> 3-letter root via the paper's length-5 patterns."""
    if word[2] in _PR53[0] and word[0] == _ALIF:        # افتعل افاعل
        return word[1] + word[3:]
    if word[3] in _PR53[1] and word[0] == _MIM:         # مفعول مفعال مفعيل
        return word[1:3] + word[4]
    if word[0] in _PR53[2] and word[4] == _TA_MARBUTA:  # مفعلة تفعلة افعلة
        return word[1:4]
    if word[0] in _PR53[3] and word[2] == _TA:          # مفتعل يفتعل تفتعل
        return word[1] + word[3:]
    if word[0] in _PR53[4] and word[2] == _ALIF:        # مفاعل تفاعل
        return word[1] + word[3:]
    if word[2] in _PR53[5] and word[4] == _TA_MARBUTA:  # فعولة فعالة
        return word[:2] + word[3]
    if word[0] in _PR53[6] and word[1] == _NUN:         # انفعل منفعل
        return word[2:]
    if word[3] == _ALIF and word[0] == _ALIF:           # افعال
        return word[1:3] + word[4]
    if word[4] == _NUN and word[3] == _ALIF:            # فعلان
        return word[:3]
    if word[3] == _YA and word[0] == _TA:               # تفعيل
        return word[1:3] + word[4]
    if word[3] == _WAW and word[1] == _ALIF:            # فاعول
        return word[0] + word[2] + word[4]
    if word[2] == _ALIF and word[1] == _WAW:            # فواعل
        return word[0] + word[3:]
    if word[3] == _HAMZA_YA and word[2] == _ALIF:       # فعائل
        return word[:2] + word[4]
    if word[4] == _TA_MARBUTA and word[1] == _ALIF:     # فاعلة
        return word[0] + word[2:4]
    if word[4] == _YA and word[2] == _ALIF:             # فعالي
        return word[:2] + word[3]
    word = _suf1(word)
    if len(word) == 5:
        word = _pre1(word)
    return word


def _pro_w54(word: str) -> str:
    """5-letter word -> 4-letter root patterns."""
    if word[0] in _PR53[2]:     # تفعلل افعلل مفعلل
        return word[1:]
    if word[4] == _TA_MARBUTA:  # فعللة
        return word[:4]
    if word[2] == _ALIF:        # فعالل
        return word[:2] + word[3:]
    return word


def _end_w5(word: str) -> str:
    if len(word) == 4:
        return _pro_w4(word)
    if len(word) == 5:
        return _pro_w54(word)
    return word


def _pro_w6(word: str) -> str:
    """6-letter word -> 3-letter root via the paper's length-6 patterns."""
    if word.startswith("است") or word.startswith(
            "مست"):                      # استفعل مستفعل
        return word[3:]
    if word[0] == _MIM and word[3] == _ALIF and word[5] == _TA_MARBUTA:
        return word[1:3] + word[4]                      # مفعالة
    if word[0] == _ALIF and word[2] == _TA and word[4] == _ALIF:
        return word[1] + word[3] + word[5]              # افتعال
    if word[0] == _ALIF and word[3] == _WAW and word[2] == word[4]:
        return word[1] + word[4:]                       # افعوعل
    if word[0] == _TA and word[2] == _ALIF and word[4] == _YA:
        return word[1] + word[3] + word[5]              # تفاعيل
    word = _suf1(word)
    if len(word) == 6:
        word = _pre1(word)
    return word


def _pro_w64(word: str) -> str:
    """6-letter word -> 4-letter root patterns."""
    if word[0] == _ALIF and word[4] == _ALIF:           # افعلال
        return word[1:4] + word[5]
    if word.startswith(_MIM + _TA):                     # متفعلل
        return word[2:]
    return word


def _end_w6(word: str) -> str:
    if len(word) == 5:
        return _end_w5(_pro_w53(word))
    if len(word) == 6:
        return _pro_w64(word)
    return word


def stem(word: str) -> str:
    """ISRI stem of one token (paper's main procedure, Fig. 1)."""
    w = _norm_diacritics(word)
    w = _pre32(w)
    w = _suf32(w)
    w = _waw(w)
    w = _norm_hamza(w)
    n = len(w)
    if n == 4:
        return _pro_w4(w)
    if n == 5:
        return _end_w5(_pro_w53(w))
    if n == 6:
        return _end_w6(_pro_w6(w))
    if n == 7:
        w = _suf1(w)
        if len(w) == 7:
            w = _pre1(w)
        if len(w) == 6:
            return _end_w6(_pro_w6(w))
        return w
    return w

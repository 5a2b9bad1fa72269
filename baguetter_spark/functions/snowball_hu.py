"""Vendored pure-Python Hungarian Snowball stemmer.

The reference resolves ``stemmer="hungarian"`` to PyStemmer's Snowball C
implementation (`baguetter/indices/sparse/text_preprocessor/stemmer.py:34`);
implemented here from the published algorithm (snowballstem.org "The
Hungarian stemming algorithm", public spec).  Golden pairs in tests are
hand-traced from the spec text, through the full step pipeline (the spec's
steps shadow each other in places — e.g. step 2's ``n`` fires before
step 3's ``án`` ever could — and the goldens trace that pipeline
behavior, not the per-step tables in isolation).

Spec conventions followed:

- vowels are ``a á e é i í o ó ö ő u ú ü ű``;
- R1: if the word begins with a vowel, R1 is the region after the first
  consonant **or digraph** (cs dz dzs gy ly ny sz ty zs); if it begins
  with a consonant, the region after the first vowel;
- each step does a longest-match over its suffix table; the matched
  suffix must start inside R1 (no retry with a shorter suffix);
- "double consonant" is one of ``bb cc ccs dd ff gg ggy jj kk ll lly mm
  nn nny pp rr ss ssz tt tty vv zz zzs``; undoubling removes the
  second-to-last character (so ``ssz``→``sz``, ``kk``→``k``).
"""

from __future__ import annotations

_VOWELS = "aáeéiíoóöőuúüű"

# digraphs for R1 marking, longest first
_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

# double consonants (longest first so ccs/ggy/lly/nny/ssz/tty/zzs win)
_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm",
    "nn", "pp", "rr", "ss", "tt", "vv", "zz",
)

# ---- step tables: (suffix, replacement|None) where None = delete ----
# step 2: frequent cases (delete, then á->a / é->e on the new ending)
_CASE = (
    "onként", "enként", "anként",
    "képpen", "nként", "képp", "ért",
    "ban", "ben", "nak", "nek", "val", "vel", "tól", "től",
    "ról", "ről", "ból", "ből", "hoz", "hez", "höz", "nál", "nél",
    "kor", "ba", "be", "ra", "re", "ig", "at", "et", "ot", "öt",
    "ul", "ül", "vá", "vé", "en", "on", "an", "ön", "n", "t",
)

# step 3: special cases
_CASE_SPECIAL = (("ánként", "a"), ("án", "a"), ("én", "e"))

# step 4: other cases
_CASE_OTHER = (
    ("astul", None), ("estül", None), ("ástul", "a"), ("éstül", "e"),
    ("stul", None), ("stül", None),
)

# step 6: owned
_OWNED = (
    ("oké", None), ("öké", None), ("aké", None), ("eké", None),
    ("áké", "a"), ("éké", "e"), ("ké", None),
    ("éié", None), ("áéi", "a"), ("ééi", "e"),
    ("éi", None), ("éé", "e"), ("é", None),
)

# step 7: singular owner
_SING_OWNER = (
    ("ünk", None), ("unk", None), ("ánk", "a"), ("énk", "e"), ("nk", None),
    ("ájuk", "a"), ("éjük", "e"), ("juk", None), ("jük", None),
    ("uk", None), ("ük", None),
    ("ám", "a"), ("ém", "e"),
    ("am", None), ("em", None), ("om", None), ("öm", None), ("m", None),
    ("ád", "a"), ("éd", "e"),
    ("ad", None), ("ed", None), ("od", None), ("öd", None), ("d", None),
    ("ja", None), ("je", None),
    ("a", None), ("e", None), ("o", None),
    ("á", "a"), ("é", "e"),
)

# step 8: plural owner
_PLUR_OWNER = (
    ("jaitok", None), ("jeitek", None),
    ("áitok", "a"), ("éitek", "e"), ("aitok", None), ("eitek", None),
    ("jaink", None), ("jeink", None),
    ("áink", "a"), ("éink", "e"), ("aink", None), ("eink", None),
    ("itek", None),
    ("jaim", None), ("jeim", None), ("áim", "a"), ("éim", "e"),
    ("aim", None), ("eim", None),
    ("jaid", None), ("jeid", None), ("áid", "a"), ("éid", "e"),
    ("aid", None), ("eid", None),
    ("jaik", None), ("jeik", None), ("áik", "a"), ("éik", "e"),
    ("aik", None), ("eik", None),
    ("jai", None), ("jei", None), ("ái", "a"), ("éi", "e"),
    ("ai", None), ("ei", None),
    ("ink", None), ("im", None), ("id", None), ("ik", None), ("i", None),
)

# step 9: plural
_PLURAL = (("ák", "a"), ("ék", "e"), ("ök", None), ("ok", None),
           ("ek", None), ("ak", None), ("k", None))


def _r1(word: str) -> int:
    """Start offset of R1 (== len(word) when R1 is empty)."""
    n = len(word)
    if n == 0:
        return 0
    if word[0] in _VOWELS:
        # after the first consonant or digraph
        i = 1
        while i < n and word[i] in _VOWELS:
            i += 1
        if i >= n:
            return n
        for dg in _DIGRAPHS:
            if word.startswith(dg, i):
                return i + len(dg)
        return i + 1
    # consonant-initial: after the first vowel
    i = 1
    while i < n and word[i] not in _VOWELS:
        i += 1
    return min(i + 1, n)


def _longest(word: str, table, p1: int):
    """Longest suffix from ``table`` (tuples or bare strings, scanned by
    descending length) whose start lies in R1; returns (suffix, repl) or
    None.  Mirrors Snowball ``[substring] R1 among(...)`` — if the longest
    match fails R1 there is no retry with a shorter one."""
    if isinstance(table[0], str):
        table = tuple((s, None) for s in table)
    best = None
    for suf, repl in table:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, repl)
    if best is None:
        return None
    if len(word) - len(best[0]) < p1:
        return None
    return best


def _ends_double(stem_part: str) -> bool:
    return any(stem_part.endswith(d) for d in _DOUBLES)


def _undouble(word: str) -> str:
    # remove the second-to-last character (ssz->sz, kk->k, ggy->gy)
    return word[:-2] + word[-1]


def stem(word: str) -> str:
    """Stem one lowercase Hungarian word (spec pipeline, steps 1-9)."""
    if len(word) < 2:
        return word
    p1 = _r1(word)

    # step 1: instrumental (al/el after a double consonant; undouble)
    m = _longest(word, ("al", "el"), p1)
    if m and _ends_double(word[: -len(m[0])]):
        word = _undouble(word[: -len(m[0])])
        p1 = min(p1, len(word))

    # step 2: frequent cases, then á->a / é->e on the exposed ending
    m = _longest(word, _CASE, p1)
    if m:
        word = word[: -len(m[0])]
        if word.endswith("á"):
            word = word[:-1] + "a"
        elif word.endswith("é"):
            word = word[:-1] + "e"

    # step 3: special cases
    m = _longest(word, _CASE_SPECIAL, p1)
    if m:
        word = word[: -len(m[0])] + m[1]

    # step 4: other cases
    m = _longest(word, _CASE_OTHER, p1)
    if m:
        word = word[: -len(m[0])] + (m[1] or "")

    # step 5: factive (á/é after a double consonant; undouble)
    m = _longest(word, ("á", "é"), p1)
    if m and _ends_double(word[: -len(m[0])]):
        word = _undouble(word[: -len(m[0])])

    # step 6: owned
    m = _longest(word, _OWNED, p1)
    if m:
        word = word[: -len(m[0])] + (m[1] or "")

    # step 7: singular owner
    m = _longest(word, _SING_OWNER, p1)
    if m:
        word = word[: -len(m[0])] + (m[1] or "")

    # step 8: plural owner
    m = _longest(word, _PLUR_OWNER, p1)
    if m:
        word = word[: -len(m[0])] + (m[1] or "")

    # step 9: plural
    m = _longest(word, _PLURAL, p1)
    if m:
        word = word[: -len(m[0])] + (m[1] or "")

    return word

"""Vendored Penn Treebank word tokenizer + rule-based sentence splitter.

The reference registers ``tokenizer="word"`` = ``nltk.word_tokenize`` and
``tokenizer="sent"`` = ``nltk.sent_tokenize``
(`baguetter/indices/sparse/text_preprocessor/tokenizer.py:12-17`).
``word_tokenize`` is the published Penn Treebank rule cascade (Robert
MacIntyre's ``tokenizer.sed``, 1995 — a fixed regex pipeline, no trained
model) applied per sentence; the sentence boundaries come from nltk's
*punkt*, a TRAINED model that cannot be reproduced offline.

This module vendors:

- :func:`treebank_word_tokenize` — the Treebank cascade, implemented
  from the published rules (starting quotes, punctuation, parens/
  brackets/dashes, ending quotes, the n't/'ll/'re/'ve/'s/'m/'d clitic
  splits, and the can-not/gon-na contraction list);
- :func:`sent_tokenize` — a DETERMINISTIC RULE-BASED approximation of
  punkt: split after ``[.!?]+`` (plus trailing quotes/brackets)
  followed by whitespace, guarded by a common-abbreviation list,
  single-letter initials, and decimal/ellipsis contexts.  This is the
  documented divergence from the reference: punkt's learned
  abbreviation/collocation statistics are approximated by fixed rules.
  Corpus-level effect is small (sentence boundaries only move token
  group splits for the final-period rule), but parity tests for
  ``tokenizer="word"/"sent"`` pin THIS implementation, not nltk.
- :func:`word_tokenize` — sentence split, then Treebank per sentence
  (the ``nltk.word_tokenize`` composition).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- treebank

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period (not part of an abbreviation-internal dot run)
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS = [
    re.compile(r"\b(can)(?#X)(not)\b", re.IGNORECASE),
    re.compile(r"\b(d)(?#X)('ye)\b", re.IGNORECASE),
    re.compile(r"\b(gim)(?#X)(me)\b", re.IGNORECASE),
    re.compile(r"\b(gon)(?#X)(na)\b", re.IGNORECASE),
    re.compile(r"\b(got)(?#X)(ta)\b", re.IGNORECASE),
    re.compile(r"\b(lem)(?#X)(me)\b", re.IGNORECASE),
    re.compile(r"\b(mor)(?#X)('n)\b", re.IGNORECASE),
    re.compile(r"\b(wan)(?#X)(na)(?=\s)", re.IGNORECASE),
    re.compile(r"(?<![\w'])('t)(?#X)(is)\b", re.IGNORECASE),
    re.compile(r"(?<![\w'])('t)(?#X)(was)\b", re.IGNORECASE),
]


def treebank_word_tokenize(text: str) -> list[str]:
    """Tokenize ONE sentence with the Penn Treebank rule cascade."""
    for rx, sub in _STARTING_QUOTES:
        text = rx.sub(sub, text)
    for rx, sub in _PUNCTUATION:
        text = rx.sub(sub, text)
    for rx, sub in _PARENS_BRACKETS:
        text = rx.sub(sub, text)
    # the ending-quote / clitic rules key off a trailing space
    text = " " + text + " "
    for rx, sub in _ENDING_QUOTES:
        text = rx.sub(sub, text)
    for rx in _CONTRACTIONS:
        text = rx.sub(r"\1 \2", text)
    return text.split()


# ------------------------------------------------------------- sentences

# common English abbreviations punkt learns; fixed list here (lowercased,
# no trailing dot).  Guard BOTH cased and lowercased text — the reference
# pipeline lowercases before tokenizing.
_ABBREVIATIONS = frozenset(
    "mr mrs ms dr prof st jr sr inc ltd co corp vs etc e.g i.e cf al "
    "fig figs eq eqs sec ch pp ed eds vol no nos art approx dept est "
    "min max jan feb mar apr jun jul aug sep sept oct nov dec mon tue "
    "wed thu fri sat sun u.s u.k u.n a.m p.m ph.d b.c a.d".split()
)

_BOUNDARY_RE = re.compile(r"([.!?]+[\"'\)\]]*)(\s+)")


def sent_tokenize(text: str) -> list[str]:
    """Rule-based sentence split (deterministic punkt approximation)."""
    if not text:
        return []
    sentences: list[str] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        end = m.end(1)
        # the word carrying the terminator: look back over a bounded window
        # (abbreviations are short; a >64-char "word" is never one).  A
        # full candidate re-split here would be quadratic on texts dense
        # with suppressed boundaries (e.g. pages of dotted initials).
        window = text[max(start, end - 64):end]
        last = window.rsplit(None, 1)[-1]
        core = last.rstrip(".!?\"')]")
        low = core.lower()
        if last.endswith("."):
            # abbreviation / single initial / dotted acronym: not a boundary
            if low in _ABBREVIATIONS or (len(core) == 1 and core.isalpha()):
                continue
            # u.s.a.-style internal dots suppress the boundary — but NOT
            # for decimal numbers ("$3.50." ends a sentence; punkt splits)
            numeric = (
                core.lstrip("$€£¥#+-(").replace(".", "").replace(",", "").isdigit()
            )
            if "." in core and not numeric:
                continue
        sentences.append(text[start:end].strip())
        start = m.end()
    tail = text[start:].strip()
    if tail:
        sentences.append(tail)
    return sentences


def word_tokenize(text: str) -> list[str]:
    """Sentence-split, then Treebank-tokenize each sentence
    (the ``nltk.word_tokenize`` composition)."""
    return [tok for sent in sent_tokenize(text) for tok in treebank_word_tokenize(sent)]

"""Deterministic synthetic transcripts + query fixtures (FIXTURES.md §1-2).

Seed-fixed generation (numpy ``default_rng``), Zipf term skew with designated
hot terms (>30% of turns) to exercise the hot-term/skew path, punctuation /
ampersand / unicode-quote decorations to exercise preprocessing T1-T6, and a
mix of roles/tools/timestamps matching the BASELINE.json ``input_hint`` shape.
No external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NATURAL_WORDS = (
    "the quick brown fox jumps over lazy dog journey of thousand miles begins "
    "with single step to be or not that is question spark index search score "
    "query token corpus merge block partition shuffle stream batch agent tool "
    "model answer plan code test data table join filter group sort window"
).split()

HOT_TERMS = [f"hot{i:02d}" for i in range(20)]

_DECOR = [
    "",
    ".",
    "?",
    "!",
    ",",
    "'s",
    "&co",
    "‘q’",  # unicode quotes (T3)
    "a.b.c.",  # acronyms (T4)
]


def gen_transcripts(
    n_turns: int = 10_000,
    n_convs: int | None = None,
    *,
    seed: int = 42,
    vocab_size: int = 2_000,
) -> pd.DataFrame:
    """Generate a deterministic transcripts table (conv_id, turn_idx, role,
    text, tool, ts) with Zipf-skewed vocabulary and ~20 hot terms."""
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(1, n_turns // 12)

    base_vocab = np.array(
        [f"term{i:05d}" for i in range(vocab_size)] + NATURAL_WORDS
    )
    # Zipf(s=1.1) weights over the base vocabulary
    ranks = np.arange(1, len(base_vocab) + 1, dtype=np.float64)
    zipf_w = ranks ** -1.1
    zipf_p = zipf_w / zipf_w.sum()

    conv_of_turn = rng.integers(0, n_convs, size=n_turns)
    conv_of_turn.sort()
    # turn_idx: 0-based position within each conversation
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_of_turn, return_index=True)
    for s, e in zip(starts, np.append(starts[1:], n_turns), strict=True):
        turn_idx[s:e] = np.arange(e - s, dtype=np.int32)

    roles = np.array(["user", "assistant", "system", "tool"])
    role_col = roles[np.arange(n_turns) % 4]
    tools = np.array(["search", "python", "browser", "sql"])
    tool_col = np.where(
        role_col == "tool", tools[rng.integers(0, 4, size=n_turns)], None
    )

    # lognormal turn lengths, clipped to [3, 200]
    lengths = np.clip(rng.lognormal(2.7, 0.8, size=n_turns).astype(int), 3, 200)

    # vectorized text construction: one big token draw, split by offsets
    total = int(lengths.sum())
    all_words = rng.choice(base_vocab, size=total, p=zipf_p).astype(object)
    # hot terms in >30% of turns: overwrite a random position per hit
    offsets = np.zeros(n_turns + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    for h, hot in enumerate(HOT_TERMS):
        hit = rng.random(n_turns) < (0.35 - 0.01 * h)
        rows = np.flatnonzero(hit)
        pos = offsets[rows] + (rng.random(len(rows)) * lengths[rows]).astype(np.int64)
        all_words[pos] = hot
    # preprocessing-exercising decorations on ~30% of turns
    dec_rows = np.flatnonzero(rng.random(n_turns) < 0.3)
    dec_pos = offsets[dec_rows] + (
        rng.random(len(dec_rows)) * lengths[dec_rows]
    ).astype(np.int64)
    dec_pick = rng.integers(0, len(_DECOR), size=len(dec_rows))
    for p, d in zip(dec_pos, dec_pick):
        all_words[p] = all_words[p] + _DECOR[d]

    words_list = all_words.tolist()
    texts = [
        " ".join(words_list[offsets[i] : offsets[i + 1]]) for i in range(n_turns)
    ]

    base_ts = np.datetime64("2025-01-01T00:00:00")
    ts = base_ts + (conv_of_turn.astype("int64") * 3600 + turn_idx.astype("int64") * 7).astype(
        "timedelta64[s]"
    )

    return pd.DataFrame(
        {
            "conv_id": [f"conv-{c:08d}" for c in conv_of_turn],
            "turn_idx": turn_idx,
            "role": role_col,
            "text": texts,
            "tool": tool_col,
            "ts": ts,
        }
    )


def gen_queries(
    n_queries: int = 50,
    *,
    seed: int = 7,
    vocab_size: int = 2_000,
    include_oov: bool = True,
) -> pd.DataFrame:
    """Query fixtures: 1-8 tokens from the corpus vocabulary; includes
    repeated-token queries (duplicates kept by ``to_token_ids``) and mixed
    OOV tokens (silently dropped).  Fully-OOV/empty queries are excluded
    (reference behavior is nondeterministic for them, SURVEY §4.2.7)."""
    rng = np.random.default_rng(seed)
    base_vocab = np.array(
        [f"term{i:05d}" for i in range(vocab_size)] + NATURAL_WORDS + HOT_TERMS
    )
    rows = []
    for q in range(n_queries):
        n_tok = int(rng.integers(1, 9))
        toks = list(rng.choice(base_vocab, size=n_tok))
        if n_tok > 1 and rng.random() < 0.3:
            toks[int(rng.integers(0, n_tok))] = toks[0]  # duplicate token
        if include_oov and rng.random() < 0.25:
            toks.append("zzoovtermzz")  # OOV mixed in (dropped by vocab lookup)
        rows.append({"query_id": f"q{q:05d}", "text": " ".join(toks)})
    return pd.DataFrame(rows)


# Reference unit-test corpora, ported verbatim (FIXTURES.md §3;
# reference tests/indices/sparse/model_test.py:14-21)
CORPUS_A_KEYS = ["doc1", "doc2", "doc3"]
CORPUS_A_TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "A journey of a thousand miles begins with a single step",
    "To be or not to be, that is the question",
]


def transcripts_from_corpus(keys: list[str], texts: list[str]) -> pd.DataFrame:
    """Wrap a flat (key, text) corpus into the transcripts shape, one
    conversation per doc so (conv_id, turn_idx) order == insertion order."""
    return pd.DataFrame(
        {
            "conv_id": keys,
            "turn_idx": np.zeros(len(keys), dtype=np.int32),
            "role": ["user"] * len(keys),
            "text": texts,
            "tool": [None] * len(keys),
            "ts": pd.to_datetime("2025-01-01"),
        }
    )

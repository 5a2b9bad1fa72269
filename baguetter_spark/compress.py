"""Posting-block codecs: delta + varint doc ids, raw-f32 impacts, block maxes.

The reference stores postings as scipy CSC arrays in one npz
(`baguetter/indices/sparse/models/bm25/index.py:133-147`); at 10^12-doc scale
we instead store docID-ascending posting *blocks* with:

- ``doc_ids``: delta-encoded then LEB128-varint packed (vectorized NumPy
  encode/decode — no per-int Python in the hot path),
- ``impacts``: raw little-endian float32 bytes (bit-exact roundtrip),
- ``tfs``: varint term frequencies (kept so segments can be merged by
  recomputing impacts under new global stats — merge == rebuild semantics,
  reference base.py:244-256),
- per-sub-block max impact metadata for block-max WAND pruning.
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; at most 10 passes, one per
    possible varint byte position — no per-value Python)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: number of 7-bit groups (>= 1)
    lengths = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while (tmp > 0).any():
        lengths += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint8)
    # write 7-bit groups little-endian; continuation bit on all but the last
    shifted = v.copy()
    remaining = lengths.copy()
    pos = offsets[:-1].copy()
    active = remaining > 0
    while active.any():
        byte = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = ((remaining[active] > 1).astype(np.uint8)) << 7
        out[pos[active]] = byte | cont
        shifted[active] = shifted[active] >> np.uint64(7)
        pos[active] += 1
        remaining[active] -= 1
        active = remaining > 0
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints into a uint64 array (vectorized)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    cont = (raw & 0x80) != 0
    # value-end positions: bytes with continuation bit clear
    ends = np.flatnonzero(~cont)
    assert len(ends) == count, f"varint stream has {len(ends)} values, expected {count}"
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    # shift amount of each byte within its value = (index - value_start) * 7
    value_id = np.zeros(len(raw), dtype=np.int64)
    value_id[starts[1:]] = 1
    value_id = np.cumsum(value_id)
    shifts = ((np.arange(len(raw)) - starts[value_id]) * 7).astype(np.uint64)
    contrib = payload << shifts
    out = np.zeros(count, dtype=np.uint64)
    np.add.at(out, value_id, contrib)
    return out


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta + varint encode a strictly-ascending int64 doc-id array."""
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    if d.size > 1 and deltas[1:].min() <= 0:
        msg = "doc_ids must be strictly ascending"
        raise ValueError(msg)
    return varint_encode(deltas.astype(np.uint64))


def decode_doc_ids(buf: bytes, count: int) -> np.ndarray:
    deltas = varint_decode(buf, count).astype(np.int64)
    return np.cumsum(deltas)


def encode_impacts(impacts: np.ndarray, dtype: str = "float32") -> bytes:
    """Bit-exact little-endian float bytes (f4 or f8 per index dtype config —
    the reference's `dtype` parameter, sparse/config.py:21)."""
    return np.asarray(impacts, dtype="<f4" if dtype == "float32" else "<f8").tobytes()


def decode_impacts(buf: bytes, dtype: str = "float32") -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4" if dtype == "float32" else "<f8")


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)


def sub_block_maxes(impacts: np.ndarray, sub_block_size: int) -> np.ndarray:
    """Max impact per fixed-size sub-block (WAND skip metadata)."""
    imp = np.asarray(impacts, dtype=np.float32)
    n = imp.size
    if n == 0:
        return np.empty(0, dtype=np.float32)
    n_blocks = (n + sub_block_size - 1) // sub_block_size
    padded = np.full(n_blocks * sub_block_size, -np.inf, dtype=np.float32)
    padded[:n] = imp
    return padded.reshape(n_blocks, sub_block_size).max(axis=1)

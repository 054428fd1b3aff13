"""Posting-list compression: delta + zigzag + LEB128 varint, fully vectorized.

The reference compresses stored payloads with Snappy blobs (reference:
polaris-core/.../SnappyUtils.java:10-24) and leaves posting compression to
Lucene internals. Here posting lists are first-class columns: doc_ids are
sorted, delta-encoded, zigzag-mapped (first value — and, defensively, any
value — may be negative int64) and LEB128-varint packed into a single
``binary`` cell; tf and dl streams are zigzag+varint without deltas.

All encode/decode paths are numpy-vectorized (no per-value Python loops) so
they run at Arrow-batch speed inside applyInPandas kernels.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings per block for block-max metadata


# ------------------------------------------------------------------ zigzag

def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 → uint64 zigzag (0,-1,1,-2 → 0,1,2,3)."""
    v = v.astype(np.int64, copy=False)
    return (np.left_shift(v.view(np.uint64), 1)) ^ (np.right_shift(v, 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return (np.right_shift(u, 1)).view(np.int64) ^ -(u & np.uint64(1)).view(np.int64)


# ------------------------------------------------------------------ varint

def varint_parts(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(byte_array, nbytes_per_value) — lets callers encode one big
    concatenated stream and slice per-run byte ranges without re-encoding."""
    u = u.astype(np.uint64, copy=False)
    n = len(u)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # byte-length per value: smallest k with value < 2^(7k), min 1 (≤10 passes)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = u >> np.uint64(7)
    while tmp.any():
        live = tmp != 0
        nbytes[live] += 1
        tmp = tmp >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill up to 10 byte slots per value, masked
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        chunk = ((u[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        last = nbytes[sel] == k + 1
        chunk[~last] |= 0x80
        out[starts[sel] + k] = chunk
    return out, nbytes


def varint_encode(u: np.ndarray) -> bytes:
    """uint64 array → LEB128 bytes (7 payload bits per byte, msb = continue)."""
    return varint_parts(u)[0].tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    vid = np.cumsum(is_end) - is_end  # value index per byte
    pos = np.arange(len(b), dtype=np.int64) - starts[vid]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.bitwise_or.reduceat(contrib, starts)


# ------------------------------------------------------- posting-level API

def encode_ints(values: np.ndarray, delta: bool = False) -> bytes:
    """int64 array → varint blob; with delta=True, delta-encode first
    (values must be sorted ascending)."""
    v = np.asarray(values, dtype=np.int64)
    if delta and len(v) > 0:
        d = np.empty_like(v)
        d[0] = v[0]
        np.subtract(v[1:], v[:-1], out=d[1:])
        v = d
    return varint_encode(zigzag_encode(v))


def decode_ints(buf: bytes, delta: bool = False) -> np.ndarray:
    v = zigzag_decode(varint_decode(buf))
    if delta and len(v) > 0:
        v = np.cumsum(v)
    return v.astype(np.int64, copy=False)


def decode_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Decode one posting row's position blob.

    ``buf`` holds, per posting (in doc order), that posting's ``tf`` positions
    delta-encoded within the posting (first absolute, then gaps), all
    zigzag+varint packed into one stream. ``tfs`` gives the per-posting
    position counts (one position per occurrence — no separate lengths are
    stored). Returns a list of absolute-position int64 arrays, one per
    posting."""
    flat = zigzag_decode(varint_decode(buf)).astype(np.int64, copy=False)
    lens = np.asarray(tfs, dtype=np.int64)
    if len(flat) != int(lens.sum()):
        raise ValueError("position stream length != sum(tf)")
    if len(flat) == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(len(lens))]
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    absd = np.cumsum(flat)
    offsets = np.repeat(
        np.concatenate(([0], absd[starts[1:] - 1])) if len(starts) > 1 else np.zeros(1, dtype=np.int64),
        lens,
    )
    abs_pos = absd - offsets
    return np.split(abs_pos, np.cumsum(lens)[:-1])


def block_last(values: np.ndarray, block: int = BLOCK_SIZE) -> np.ndarray:
    """Last value of each block (skip pointers for WAND)."""
    v = np.asarray(values)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=v.dtype)
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    vp = np.concatenate([v, np.full(pad, v[-1])]) if pad else v
    return vp.reshape(nblocks, block)[:, -1]


def block_max_float(values: np.ndarray, block: int = BLOCK_SIZE) -> np.ndarray:
    """Max float per block (padding with -inf)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    if pad:
        v = np.concatenate([v, np.full(pad, -np.inf)])
    return v.reshape(nblocks, block).max(axis=1)

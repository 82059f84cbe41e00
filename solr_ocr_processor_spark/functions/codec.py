"""Posting-block compression: delta + LEB128 varint, numpy-vectorized.

The analog of the compact MiniOCR encoding the reference emits so Solr
stores small position-annotated payloads (app/process/alto.go:275-385
— hierarchical XML squeezed to one-letter tags with packed coordinate
strings). Our posting blocks pack sorted doc-id gaps, tfs, doc
lengths, and position deltas as varint byte streams.

Everything here is pure numpy over uint64 arrays — no per-value Python
in encode or decode (a constant ≤10-iteration byte-position loop does
the vectorized work). These functions run inside applyInPandas /
mapInPandas on Arrow batches.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array -> bytes."""
    vals = np.ascontiguousarray(vals, dtype=_U64)
    n = vals.size
    if n == 0:
        return b""
    # number of 7-bit groups per value (>=1)
    nbytes = np.ones(n, dtype=np.int64)
    v = vals >> _U64(7)
    while v.any():
        nbytes += v > 0
        v = v >> _U64(7)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        idx = offsets[mask] + j
        byte = (vals[mask] >> _U64(7 * j)) & _U64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte stream -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    last = (b & 0x80) == 0
    gid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(last[:-1], out=gid[1:])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    contrib = (b.astype(_U64) & _U64(0x7F)) << (_U64(7) * pos.astype(_U64))
    vals = np.zeros(int(last.sum()), dtype=_U64)
    np.bitwise_or.at(vals, gid, contrib)
    return vals


def delta_encode(sorted_vals: np.ndarray) -> bytes:
    """Gap-encode a sorted uint64 array (first value absolute) + varint."""
    v = np.ascontiguousarray(sorted_vals, dtype=_U64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    return varint_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps, dtype=_U64)


def encode_positions(tfs: np.ndarray, flat_positions: np.ndarray) -> bytes:
    """Encode per-doc position lists.

    ``flat_positions`` is the concatenation of each doc's sorted
    token positions; ``tfs`` gives the per-doc counts. Positions are
    delta-encoded *within* each doc (reset at doc boundaries), then
    varint-packed. Decode side recovers boundaries from the tfs stream.
    """
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    p = np.ascontiguousarray(flat_positions, dtype=np.int64)
    if p.size == 0:
        return b""
    gaps = np.empty_like(p)
    gaps[0] = p[0]
    np.subtract(p[1:], p[:-1], out=gaps[1:])
    starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    gaps[starts] = p[starts]  # reset delta at each doc boundary
    return varint_encode(gaps.astype(_U64))


def decode_positions(tfs: np.ndarray, buf: bytes) -> np.ndarray:
    """Inverse of :func:`encode_positions` -> flat int64 positions."""
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    gaps = varint_decode(buf).astype(np.int64)
    if gaps.size == 0:
        return gaps
    # segmented cumsum: subtract each segment-start's running offset
    out = np.cumsum(gaps)
    starts = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    seg_base = np.zeros(gaps.size, dtype=np.int64)
    # carry = cumulative sum just before each segment start
    carry = out[starts] - gaps[starts]
    gid = np.zeros(gaps.size, dtype=np.int64)
    gid[starts[1:]] = 1
    gid = np.cumsum(gid)
    seg_base = carry[gid]
    return out - seg_base

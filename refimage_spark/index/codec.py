"""Delta + varbyte codec, vectorized numpy (no per-element Python).

Format: classic VB — little-endian base-128; the HIGH bit set marks the
LAST byte of a value. Doc ids are delta-encoded (gaps) before VB.

Reference analogue: the FAISS index serialization it replaces is an
opaque binary (/root/reference/src/refimage/search/__init__.py:343-353);
this codec is the from-scratch posting-list compression required by the
rebuild's north rule.
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode + per-value byte lengths (lets a caller slice one big blob
    into per-group regions via cumsum, e.g. per-term posting ranges)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    lengths = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp):
        lengths += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    shifted = v.copy()
    for b in range(int(lengths.max())):
        mask = lengths > b
        pos = starts[mask] + b
        out[pos] = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        shifted = shifted >> np.uint64(7)
    out[ends - 1] |= 0x80
    return out.tobytes(), lengths


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode non-negative int64/uint64 array. Vectorized: compute each
    value's byte length, scatter 7-bit groups into one output buffer."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value = number of 7-bit groups (>=1)
    lengths = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp):
        lengths += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    shifted = v.copy()
    max_len = int(lengths.max())
    for b in range(max_len):
        mask = lengths > b
        pos = starts[mask] + b
        out[pos] = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        shifted = shifted >> np.uint64(7)
    out[ends - 1] |= 0x80  # terminator bit on last byte of each value
    return out.tobytes()


def varbyte_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode to uint64 array. Vectorized via reduceat over value groups.

    Fast path: when EVERY value is one byte (all terminator bits set),
    decode is a single mask+cast. That is the dominant posting shape —
    dense doc-id gaps and tf<128 — and it is ~8x faster than the general
    path, which itself maps bytes to value groups with one np.repeat
    (O(bytes)) rather than a per-byte searchsorted (O(bytes log values),
    the previous serving-kernel hotspot)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b & 0x80)
    if ends.size == b.size:  # all single-byte values
        out = (b & np.uint8(0x7F)).astype(np.uint64)
        if count is not None:
            assert out.size == count, (out.size, count)
        return out
    lengths = np.diff(np.concatenate(([np.int64(-1)], ends)))
    starts = ends - lengths + 1
    # position of each byte within its value group
    idx = np.arange(b.size, dtype=np.int64)
    within = idx - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    sums = np.add.reduceat(contrib, starts)
    if count is not None:
        assert sums.size == count, (sums.size, count)
    return sums.astype(np.uint64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    a = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def blocked_delta_decode(gaps: np.ndarray, block: int) -> np.ndarray:
    """Decode gaps that RESET every ``block`` values (the gap at each
    block start is the absolute doc id). Segmented cumsum, vectorized:
    docs[i] = cumsum[i] - (cumsum[start-1]) for i's block."""
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    cs = np.cumsum(g)
    starts = np.arange(0, g.size, block)
    base = cs[starts] - g[starts]  # == cs[start-1]; 0 for the first block
    sizes = np.diff(np.append(starts, g.size))
    return cs - np.repeat(base, sizes)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(docs_blob, tfs_blob): gaps-VB for sorted doc ids, VB for tfs."""
    gaps = delta_encode(doc_ids)
    return varbyte_encode(gaps), varbyte_encode(tfs)


def decode_postings(
    docs_blob: bytes, tfs_blob: bytes, count: int
) -> tuple[np.ndarray, np.ndarray]:
    doc_ids = delta_decode(varbyte_decode(docs_blob, count))
    tfs = varbyte_decode(tfs_blob, count).astype(np.int64)
    return doc_ids, tfs

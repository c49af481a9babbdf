"""Delta + varbyte (LEB128) posting-list compression, numpy-vectorized.

Posting blocks store docIDs as deltas (first value absolute, then gaps) and
tf / dl streams as plain varbyte. Encoding and decoding operate on whole
numpy arrays with O(max_bytes) vector passes — no per-integer Python loops —
so they stay cheap inside Arrow-batched UDFs (SURVEY §2.4 N3).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "varbyte_encode",
    "varbyte_decode",
    "encode_posting_block",
    "decode_posting_block",
]

_MAX_BYTES = 10  # 64-bit values need at most 10 LEB128 bytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: one pass per byte position."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nbytes += (v != 0).astype(np.int64)
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    starts = ends - nbytes
    remaining = vals.copy()
    # write byte position j of every value that has >= j+1 bytes
    idx = np.arange(n)
    for j in range(int(nbytes.max())):
        live = nbytes > j
        pos = starts[live] + j
        chunk = remaining[live]
        is_last = nbytes[live] == j + 1
        byte = (chunk & np.uint64(0x7F)).astype(np.uint8)
        byte[~is_last] |= 0x80
        out[pos] = byte
        remaining[idx[live]] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array. Vectorized."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (buf & 0x80) == 0
    n_values = int(is_last.sum())
    # value index of every byte: number of completed values before it
    value_idx = np.zeros(buf.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last)[:-1]
    # byte position within its value
    starts = np.zeros(n_values, dtype=np.int64)
    ends = np.nonzero(is_last)[0]
    starts[1:] = ends[:-1] + 1
    byte_pos = np.arange(buf.size, dtype=np.int64) - starts[value_idx]
    payload = (buf & 0x7F).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64))
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, value_idx, payload)
    return out


def encode_posting_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> tuple[bytes, bytes, bytes]:
    """Encode one sorted posting block: docID deltas + tf + dl varbyte streams."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    gaps = np.empty_like(doc_ids)
    if len(doc_ids):
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    return (
        varbyte_encode(gaps),
        varbyte_encode(np.asarray(tfs, dtype=np.uint64)),
        varbyte_encode(np.asarray(dls, dtype=np.uint64)),
    )


def decode_posting_block(
    gaps_b: bytes, tfs_b: bytes, dls_b: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_posting_block`."""
    gaps = varbyte_decode(gaps_b)
    doc_ids = np.cumsum(gaps, dtype=np.uint64)
    return doc_ids, varbyte_decode(tfs_b), varbyte_decode(dls_b)

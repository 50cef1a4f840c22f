"""Posting-list encoding: delta + LEB128 varint, block max-impact metadata.

The reference leaves the inverted index to Elasticsearch; here we own it
(BASELINE.json north_rule).  A posting list for one (term, salt) cell is

    doc_ids : strictly increasing int64  → delta-encoded → varint bytes
    tfs     : int32 ≥ 1                  → varint bytes
    blocks  : per ``block_size`` docs, the last doc_id (skip pointer)
              and the max tf-normalization component of BM25
              (idf-independent, so deltas/merges never invalidate it;
              idf is applied at query time) — this is the block-max
              metadata used for WAND pruning.

All encode/decode paths are numpy-vectorized (no per-value Python loop:
the loops below run over *byte positions*, ≤10 iterations).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit value → ≤10 LEB128 bytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized over byte positions."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(arr)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nb = np.ones(n, dtype=np.int64)
    v = arr >> np.uint64(7)
    while v.any():
        nb += (v > 0)
        v >>= np.uint64(7)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=offs[1:])
    total = int(offs[-1] + nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_nb = int(nb.max())
    for j in range(max_nb):
        sel = nb > j
        idx = offs[sel] + j
        byte = ((arr[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array. Vectorized over byte positions."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (data & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(int(lens.max())):
        sel = lens > j
        vals[sel] |= (data[starts[sel] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → first id + gaps (uint64)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if len(ids) == 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(ids), dtype=np.uint64)
    out[0] = np.uint64(ids[0])
    if len(ids) > 1:
        out[1:] = np.diff(ids).astype(np.uint64)
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.uint64), dtype=np.uint64).astype(np.int64)


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) → (doc_ids_enc, tfs_enc)."""
    return (varint_encode(delta_encode(doc_ids)),
            varint_encode(np.ascontiguousarray(tfs, dtype=np.uint64)))


def decode_posting_list(doc_ids_enc: bytes, tfs_enc: bytes) -> tuple[np.ndarray, np.ndarray]:
    doc_ids = delta_decode(varint_decode(doc_ids_enc))
    tfs = varint_decode(tfs_enc).astype(np.int64)
    return doc_ids, tfs


def tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float,
            k1: float, b: float) -> np.ndarray:
    """BM25 term-frequency normalization component (float64):
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.  idf is applied
    separately so this is stable under df changes."""
    # NB: operation order mirrors scoring.tfn_scalar exactly
    # (b * dl / avgdl, not b * (dl / avgdl)) so float64 results are
    # bit-identical to the oracle's scalar path.
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / float(avgdl)))


def block_metadata(doc_ids: np.ndarray, tfnorms: np.ndarray,
                   block_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max_tfnorm) for block-max WAND skipping."""
    n = len(doc_ids)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    n_blocks = (n + block_size - 1) // block_size
    last = np.empty(n_blocks, dtype=np.int64)
    mx = np.empty(n_blocks, dtype=np.float64)
    for i in range(n_blocks):
        lo, hi = i * block_size, min((i + 1) * block_size, n)
        last[i] = doc_ids[hi - 1]
        mx[i] = tfnorms[lo:hi].max()
    return last, mx

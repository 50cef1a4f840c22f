"""Codec round-trip tests, property-based per SURVEY.md §5.2."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mee_ray.postings import (
    block_metadata, decode_posting_list, delta_decode, delta_encode,
    encode_posting_list, tf_norm, varint_decode, varint_encode,
)


def _pyvarint(values):
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_and_wire_format(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varint_encode(arr)
    assert enc == _pyvarint(vals)  # wire-format equals the scalar reference
    dec = varint_decode(enc)
    assert dec.tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    ids = np.array(sorted(ids), dtype=np.int64)
    assert (delta_decode(delta_encode(ids)) == ids).all()


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2**62),
                          st.integers(min_value=1, max_value=10_000)),
                min_size=0, max_size=300))
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip(pairs):
    pairs = sorted({d: t for d, t in pairs}.items())
    ids = np.array([d for d, _ in pairs], dtype=np.int64)
    tfs = np.array([t for _, t in pairs], dtype=np.int64)
    de, te = encode_posting_list(ids, tfs)
    ids2, tfs2 = decode_posting_list(de, te)
    assert (ids2 == ids).all()
    assert (tfs2 == tfs).all()


def test_empty_roundtrip():
    de, te = encode_posting_list(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    ids, tfs = decode_posting_list(de, te)
    assert len(ids) == 0 and len(tfs) == 0


def test_block_metadata():
    ids = np.arange(0, 300, dtype=np.int64)
    tfn = np.linspace(0.1, 2.0, 300)
    last, mx = block_metadata(ids, tfn, block_size=128)
    assert last.tolist() == [127, 255, 299]
    assert np.allclose(mx, [tfn[127], tfn[255], tfn[299]])
    # invariant: every posting's tfnorm ≤ its block max
    for i in range(300):
        assert tfn[i] <= mx[i // 128] + 1e-15


def test_tf_norm_matches_scalar():
    from mee_ray.config import BM25Params
    from mee_ray.scoring import tfn_scalar
    p = BM25Params()
    tfs = np.array([1, 2, 5, 100], dtype=np.int64)
    dls = np.array([10, 20, 5, 1000], dtype=np.int64)
    v = tf_norm(tfs, dls, avgdl=37.5, k1=p.k1, b=p.b)
    for i in range(4):
        assert v[i] == tfn_scalar(float(tfs[i]), float(dls[i]), 37.5, p)

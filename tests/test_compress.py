"""Varbyte/delta codec round-trip properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsidx.compress import (
    decode_posting_block,
    encode_posting_block,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_boundaries():
    arr = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21, 2**28, 2**35, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=10**4),
            st.integers(min_value=1, max_value=10**6),
        ),
        max_size=100,
    )
)
@settings(max_examples=100, deadline=None)
def test_posting_block_roundtrip(postings):
    postings = sorted(set((d, tf, dl) for d, tf, dl in postings))
    doc_ids = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    g, t, d = encode_posting_block(doc_ids, tfs, dls)
    rd, rt, rdl = decode_posting_block(g, t, d)
    assert np.array_equal(rd, doc_ids)
    assert np.array_equal(rt, tfs)
    assert np.array_equal(rdl, dls)


def test_compression_shrinks_dense_lists():
    # dense docIDs -> gaps of 1 -> 1 byte each vs 8-byte raw longs
    doc_ids = np.arange(10_000, dtype=np.uint64)
    g = varbyte_encode(np.diff(doc_ids, prepend=np.uint64(0)))
    assert len(g) < doc_ids.nbytes / 7

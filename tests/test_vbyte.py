"""VByte codec round-trip + property tests (FIXTURES.md §6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from terrier_spark.compression.vbyte import (
    decode_posting_block,
    encode_posting_block,
    vbyte_decode,
    vbyte_encode,
)


def test_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0
    ids, tfs = decode_posting_block(b"")
    assert ids.size == 0 and tfs.size == 0


def test_small_values_one_byte_each():
    vals = np.arange(128, dtype=np.uint64)
    enc = vbyte_encode(vals)
    assert len(enc) == 128
    np.testing.assert_array_equal(vbyte_decode(enc), vals)


def test_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21,
         2**28, 2**35, 2**63 - 1],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_roundtrip_property(values):
    vals = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(vals), vals.size), vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=100000),
        ),
        min_size=1,
        max_size=500,
    )
)
def test_posting_block_roundtrip(postings):
    # unique ascending docids
    ids = np.array(sorted({d for d, _ in postings}), dtype=np.int64)
    tfs = np.array([t for _, t in postings[: ids.size]], dtype=np.int64)
    block = encode_posting_block(ids, tfs)
    out_ids, out_tfs = decode_posting_block(block)
    np.testing.assert_array_equal(out_ids, ids)
    np.testing.assert_array_equal(out_tfs, tfs)


def test_posting_block_docid_zero():
    ids = np.array([0, 5, 6, 100], dtype=np.int64)
    tfs = np.array([3, 1, 2, 9], dtype=np.int64)
    out_ids, out_tfs = decode_posting_block(encode_posting_block(ids, tfs))
    np.testing.assert_array_equal(out_ids, ids)
    np.testing.assert_array_equal(out_tfs, tfs)


def test_compression_is_compact():
    # dense ascending docids -> gaps of 1 -> ~1 byte per id + 1 per tf + header
    ids = np.arange(10000, dtype=np.int64)
    tfs = np.ones(10000, dtype=np.int64)
    block = encode_posting_block(ids, tfs)
    assert len(block) <= 8 + 2 * 10000 + 2

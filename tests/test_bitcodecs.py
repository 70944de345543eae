"""Bit-level codec round-trips: unary/gamma/delta/Golomb bit streams,
the reference bit posting layout, binary interpolative coding, and the
Lemire-family block codecs (FOR / patched FOR / Simple16).

Reference formats mirrored:
org/terrier/structures/postings/bit/BasicIterablePosting.java:38
(gamma-gap + unary-tf layout), compression/bit/BitOutBase.java,
compression/integer/codec/{GolombCodec,LemireCodec}.java.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from terrier_spark.compression.bitcodecs import (
    BitReader,
    BitWriter,
    decode_bit_postings,
    encode_bit_postings,
    for_decode,
    for_encode,
    interpolative_decode,
    interpolative_encode,
    pfor_decode,
    pfor_encode,
    simple16_decode,
    simple16_encode,
)

pos_ints = st.lists(st.integers(min_value=1, max_value=1 << 40),
                    min_size=1, max_size=200)


@given(pos_ints)
@settings(max_examples=60, deadline=None)
def test_gamma_roundtrip(vals):
    w = BitWriter()
    for v in vals:
        w.write_gamma(v)
    r = BitReader(w.getvalue())
    assert [r.read_gamma() for _ in vals] == vals


@given(pos_ints)
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip(vals):
    w = BitWriter()
    for v in vals:
        w.write_delta(v)
    r = BitReader(w.getvalue())
    assert [r.read_delta() for _ in vals] == vals


@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1,
                max_size=100))
@settings(max_examples=60, deadline=None)
def test_unary_roundtrip(vals):
    w = BitWriter()
    for v in vals:
        w.write_unary(v)
    r = BitReader(w.getvalue())
    assert [r.read_unary() for _ in vals] == vals


@given(st.lists(st.integers(min_value=1, max_value=1 << 20), min_size=1,
                max_size=100),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=60, deadline=None)
def test_golomb_roundtrip(vals, b):
    w = BitWriter()
    for v in vals:
        w.write_golomb(v, b)
    r = BitReader(w.getvalue())
    assert [r.read_golomb(b) for _ in vals] == vals


@given(st.sets(st.integers(min_value=0, max_value=100_000), min_size=1,
               max_size=300),
       st.integers(min_value=1, max_value=40))
@settings(max_examples=40, deadline=None)
def test_bit_posting_layout_roundtrip(idset, tfmax):
    ids = np.asarray(sorted(idset), dtype=np.int64)
    tfs = (ids % tfmax) + 1
    data = encode_bit_postings(ids, tfs)
    got_ids, got_tfs = decode_bit_postings(data, ids.size)
    assert np.array_equal(got_ids, ids)
    assert np.array_equal(got_tfs, tfs)


@given(st.sets(st.integers(min_value=0, max_value=9_999), min_size=1,
               max_size=300))
@settings(max_examples=40, deadline=None)
def test_interpolative_roundtrip(idset):
    ids = np.asarray(sorted(idset), dtype=np.int64)
    data = interpolative_encode(ids, universe=10_000)
    got = interpolative_decode(data, ids.size, universe=10_000)
    assert np.array_equal(got, ids)


@given(st.lists(st.integers(min_value=-(1 << 40), max_value=1 << 40),
                min_size=0, max_size=500))
@settings(max_examples=60, deadline=None)
def test_for_roundtrip(vals):
    v = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(for_decode(for_encode(v)), v)


@given(st.lists(st.integers(min_value=-(1 << 30), max_value=1 << 30),
                min_size=1, max_size=500))
@settings(max_examples=40, deadline=None)
def test_pfor_roundtrip(vals):
    v = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(pfor_decode(pfor_encode(v)), v)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 28) - 1),
                min_size=1, max_size=400))
@settings(max_examples=40, deadline=None)
def test_simple16_roundtrip(vals):
    v = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(simple16_decode(simple16_encode(v)), v)


def test_simple16_dense_small_values_pack_tightly():
    # 280 ones pack 28 per word: 10 payload words + 1 length word
    v = np.ones(280, dtype=np.int64)
    assert len(simple16_encode(v)) == 4 * 11


def test_gap_compression_beats_vbyte_on_dense_lists():
    """The dense-docid case the bit format exists for: gamma gaps on a
    dense list beat 1-byte-minimum VByte."""
    from terrier_spark.compression.vbyte import vbyte_encode

    ids = np.arange(0, 4000, 2, dtype=np.int64)  # gaps of 2
    tfs = np.ones(ids.size, dtype=np.int64)
    bit = encode_bit_postings(ids, tfs)
    byte = vbyte_encode(np.diff(ids, prepend=-1).astype(np.uint64))
    assert len(bit) < len(byte)


@given(st.lists(st.integers(min_value=0, max_value=1 << 20), min_size=1,
                max_size=60),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=60, deadline=None)
def test_skewed_golomb_roundtrip(vals, b):
    w = BitWriter()
    for v in vals:
        w.write_skewed_golomb(v, b)
    r = BitReader(w.getvalue())
    assert [r.read_skewed_golomb(b) for _ in vals] == vals


@given(st.integers(min_value=2, max_value=1 << 16), st.data())
@settings(max_examples=80, deadline=None)
def test_minimal_binary_roundtrip(b, data):
    vals = data.draw(st.lists(st.integers(min_value=0, max_value=b - 1),
                              min_size=1, max_size=40))
    w = BitWriter()
    for v in vals:
        w.write_minimal_binary(v, b)
    r = BitReader(w.getvalue())
    assert [r.read_minimal_binary(b) for _ in vals] == vals


def test_minimal_binary_code_lengths():
    # b = 6: m = 2^3 - 6 = 2 -> values 0,1 take 2 bits; 2..5 take 3
    for x, nbits in [(0, 2), (1, 2), (2, 3), (5, 3)]:
        w = BitWriter()
        w.write_minimal_binary(x, 6)
        assert len(w) == nbits, (x, len(w))
    # power-of-two alphabet: plain binary, log2b bits for every value
    for x in range(8):
        w = BitWriter()
        w.write_minimal_binary(x, 8)
        assert len(w) == 3
    # 1-value alphabet carries no bits
    w = BitWriter()
    w.write_minimal_binary(0, 1)
    assert len(w) == 0


def test_skewed_golomb_bucket_structure():
    # b = 4: bucket 0 = [0,4) unary 1 + mb(4) = 1+2 bits; bucket 1 =
    # [4,12) unary 2 + mb(8) = 2+3; bucket 2 = [12,28) unary 3 + mb(16)
    for x, nbits in [(0, 3), (3, 3), (4, 5), (11, 5), (12, 7), (27, 7)]:
        w = BitWriter()
        w.write_skewed_golomb(x, 4)
        assert len(w) == nbits, (x, len(w))

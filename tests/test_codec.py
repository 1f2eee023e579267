"""Varbyte block codec roundtrip + property tests (no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marlin_spark.functions.codec import (
    decode_block,
    decode_positions,
    encode_block,
    vb_decode,
    vb_encode,
)


def test_vb_known_values():
    assert vb_encode(np.array([0])) == b"\x00"
    assert vb_encode(np.array([1])) == b"\x01"
    assert vb_encode(np.array([127])) == b"\x7f"
    assert vb_encode(np.array([128])) == b"\x80\x01"  # little-endian groups
    assert vb_encode(np.array([300])) == b"\xac\x02"
    assert list(vb_decode(b"\xac\x02\x7f")) == [300, 127]
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),
        max_size=200,
    )
)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(vb_decode(vb_encode(arr))) == vals


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_block_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=128))
    gaps = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=10_000), min_size=n, max_size=n
        )
    )
    docids = np.cumsum(np.array(gaps, dtype=np.uint64))
    tfs = np.array(
        data.draw(
            st.lists(st.integers(min_value=1, max_value=8), min_size=n, max_size=n)
        ),
        dtype=np.uint64,
    )
    dls = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=500), min_size=n, max_size=n
            )
        ),
        dtype=np.uint64,
    )
    # positions: per doc, tf strictly-increasing 1-based values
    pos_list = []
    for tf in tfs:
        pgaps = data.draw(
            st.lists(
                st.integers(min_value=1, max_value=50),
                min_size=int(tf),
                max_size=int(tf),
            )
        )
        pos_list.extend(np.cumsum(pgaps))
    positions = np.array(pos_list, dtype=np.int64)

    pb, xb = encode_block(docids, tfs, dls, positions)
    d2, t2, l2 = decode_block(pb)
    assert list(d2) == list(docids)
    assert list(t2) == list(tfs)
    assert list(l2) == list(dls)
    assert list(decode_positions(xb, t2)) == list(positions)


def test_compression_is_real():
    docids = np.arange(1, 129, dtype=np.uint64) * 3
    tfs = np.ones(128, dtype=np.uint64)
    dls = np.full(128, 20, dtype=np.uint64)
    positions = np.ones(128, dtype=np.int64)
    pb, xb = encode_block(docids, tfs, dls, positions)
    # gaps of 3, tf 1, dl 20 -> 1 byte each
    assert len(pb) < 128 * 4
    assert len(xb) == 128

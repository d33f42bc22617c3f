"""Property-based codec tests (hypothesis): the varint/delta codec must
round-trip ANY uint64 array, not just the shapes the unit tests chose —
the reference's test strategy has no property-based layer (SURVEY.md §5
"what's absent"), this is the engine's upgrade on it."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from similaripy_spark.fulltext import codec

uint64s = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=0, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(uint64s)
def test_varint_roundtrip_any_uint64(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = codec.encode_varints(arr)
    out = codec.decode_varints(buf, len(arr))
    np.testing.assert_array_equal(out.astype(np.uint64), arr)


@settings(max_examples=200, deadline=None)
@given(uint64s)
def test_varint_lens_agree_with_buffer(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf, lens = codec.encode_varints_with_lens(arr)
    assert int(lens.sum()) == len(buf)
    # per-value slices decode independently
    off = 0
    for v, ln in zip(arr, lens):
        got = codec.decode_varints(buf[off : off + int(ln)], 1)
        assert int(got[0]) == int(v)
        off += int(ln)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 62) - 1),
        min_size=1,
        max_size=300,
    )
)
def test_delta_roundtrip_any_sorted_docs(vals):
    docs = np.array(sorted(vals), dtype=np.int64)
    first = int(docs[0])
    deltas = codec.delta_encode(docs, first)
    assert (np.asarray(deltas) >= 0).all()
    out = codec.delta_decode(np.asarray(deltas), first)
    np.testing.assert_array_equal(np.asarray(out), docs)

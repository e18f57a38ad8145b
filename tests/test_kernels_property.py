"""Property-based kernel round-trips (Hypothesis, fixed seeds via derandomize).

SURVEY.md §5: the engine promises randomized-array round-trips with the rigor
the reference's kernel tests lack.  Every int codec must round-trip ANY int
array bit-identically; every string codec ANY byte-string list.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from clj_orc_spark.kernels import INT_CODECS, STR_CODECS, StringCol, decode_any
from clj_orc_spark.selector import encode_column

SETTINGS = dict(max_examples=60, deadline=None, derandomize=True)

int_arrays = st.one_of(
    *[
        st.lists(
            st.integers(min_value=int(np.iinfo(dt).min), max_value=int(np.iinfo(dt).max)),
            max_size=300,
        ).map(lambda xs, dt=dt: np.array(xs, dtype=dt))
        for dt in (np.int8, np.int16, np.int32, np.int64,
                   np.uint8, np.uint16, np.uint32, np.uint64)
    ]
)

byte_lists = st.lists(st.binary(max_size=40), max_size=120)


@given(arr=int_arrays)
@settings(**SETTINGS)
def test_every_int_codec_roundtrips_any_array(arr):
    for name, codec in INT_CODECS.items():
        payload, meta = codec.encode(arr)
        out = decode_any(payload, meta)
        assert out.dtype == arr.dtype, name
        assert np.array_equal(out, arr), name


@given(items=byte_lists)
@settings(**SETTINGS)
def test_every_str_codec_roundtrips_any_bytes(items):
    col = StringCol.from_list(items)
    for name, codec in STR_CODECS.items():
        payload, meta = codec.encode(col)
        out = decode_any(payload, meta)
        assert out.data == col.data and np.array_equal(out.offsets, col.offsets), name


@given(arr=int_arrays)
@settings(**SETTINGS)
def test_selector_never_worse_than_plain(arr):
    payload, meta, sel = encode_column(arr, "int")
    assert np.array_equal(decode_any(payload, meta), arr)
    assert len(payload) <= max(arr.nbytes, 16)


@given(items=byte_lists)
@settings(**SETTINGS)
def test_selector_str_roundtrip_any(items):
    col = StringCol.from_list(items)
    payload, meta, sel = encode_column(col, "str")
    out = decode_any(payload, meta)
    assert out.data == col.data and np.array_equal(out.offsets, col.offsets)

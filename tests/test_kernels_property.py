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


# --- rowgroup plan invariants (pure planning math, no Spark) -----------------

import pyarrow as _pa
import pyarrow.parquet as _pq
from hypothesis import given as _given, settings as _settings, strategies as _st


@_settings(max_examples=25, deadline=None)
@_given(
    rg_rows=_st.lists(_st.integers(min_value=1, max_value=500), min_size=1,
                      max_size=8),
    n_partitions=_st.integers(min_value=1, max_value=24),
    explicit=_st.booleans(),
)
def test_rowgroup_plan_covers_every_row_exactly_once(
    tmp_path_factory, rg_rows, n_partitions, explicit
):
    """THE planner correctness property: the union of all planned
    (file, row_group, lo, hi) units covers every input row exactly once —
    no loss, no duplication — for any row-group layout, partition count,
    and split mode."""
    import numpy as np

    from clj_orc_spark.pipeline.encode import _rowgroup_plan

    d = tmp_path_factory.mktemp("rgplan")
    path = str(d / "t.parquet")
    writer = None
    for n in rg_rows:
        t = _pa.table({
            "doc_id": _pa.array([f"d{i}" for i in range(n)]),
            "tokens": _pa.array([[1]] * n, type=_pa.list_(_pa.int32())),
            "n_tok": _pa.array([1] * n, type=_pa.int32()),
            "source": _pa.array(["s"] * n),
        })
        if writer is None:
            writer = _pq.ParquetWriter(path, t.schema)
        writer.write_table(t, row_group_size=n)
    writer.close()

    plan = _rowgroup_plan([path], n_partitions, explicit)
    seen: dict[tuple, np.ndarray] = {
        (path, i): np.zeros(n, dtype=np.int32) for i, n in enumerate(rg_rows)
    }
    for part in plan["parts"]:
        for f, rg, lo, hi in part:
            assert 0 <= lo <= hi <= rg_rows[rg]
            seen[(f, rg)][lo:hi] += 1
    for counts in seen.values():
        assert (counts == 1).all(), "row lost or duplicated by the plan"
    assert plan["n_total"] == len(plan["parts"]) >= 1

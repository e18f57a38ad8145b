"""Round 5: float-valued LIST columns through the engine codec core — the
embeddings shape (``array<float>``, BASELINE input_hint's sibling table).

``list<float32>``/``list<float64>`` encode exactly like scalar floats: the
flattened values' IEEE-754 bit patterns (uint view) run through the int/float
codec stack (byte-stream split is the usual winner on mantissa-heavy
embeddings), the offsets index rides the existing list machinery, and the
values' zone maps hold finite min/max (NaN/Inf chunks go stat-less).  The
reference's type table covers float inside compound types via its recursive
column walk (`src/orc/col.clj:70-75,83-92`); NaN→nil normalization
(`src/orc/col.clj:73-74`) is deliberately NOT replicated — bit identity wins.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clj_orc_spark.pipeline import decode, encode
from clj_orc_spark.pipeline.decode import decode_chunk_table, store_schema
from clj_orc_spark.pipeline.encode import (
    OUT_SCHEMA,
    _encode_chunk_rows,
    derive_schema,
)

N = 300
DIM = 16


def _chunk_roundtrip(tbl: pa.Table, schema) -> pa.Table:
    rows = _encode_chunk_rows(tbl, 0, 0, {}, "size", schema)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(rows[f.name], type=f.type) for f in OUT_SCHEMA],
        schema=OUT_SCHEMA,
    )
    return decode_chunk_table(pa.Table.from_batches([batch]), None, schema)


def _list_bits(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(entry-validity, lengths, flat value bit patterns) of a float list
    column — the exact-comparison view (NaN-payload-safe)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    valid = np.asarray(a.is_valid())
    lens = np.asarray(pa.compute.fill_null(
        pa.compute.list_value_length(a), 0))
    flat = a.flatten().to_numpy(zero_copy_only=False)
    u = flat.view(np.uint32 if flat.dtype == np.float32 else np.uint64)
    return valid, lens, u


def _assert_list_bits_equal(got, want) -> None:
    gv, gl, gu = _list_bits(got)
    wv, wl, wu = _list_bits(want)
    assert np.array_equal(gv, wv)
    assert np.array_equal(gl, wl)
    assert np.array_equal(gu, wu)


def _emb_table(seed=3, n=N, dim=DIM) -> pa.Table:
    rng = np.random.default_rng(seed)
    emb = rng.normal(0, 1, (n, dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), type=pa.int32()),
    })


@pytest.fixture(scope="module")
def estore(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lfe")
    src = str(d / "src.parquet")
    tbl = _emb_table()
    pq.write_table(tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, tbl


def test_derive_schema_accepts_float_lists():
    sch = derive_schema(pa.schema([
        ("a", pa.list_(pa.float32())),
        ("b", pa.large_list(pa.float64())),
        ("c", pa.list_(pa.int32())),
    ]))
    assert sch == [("a", "listf32"), ("b", "listf64"), ("c", "list32")]
    with pytest.raises(ValueError, match="unsupported list value type"):
        derive_schema(pa.schema([("s", pa.list_(pa.list_(pa.string())))]))


def test_nan_payload_bits_roundtrip_in_lists():
    """NaN payloads, ±inf, ±0.0 and random bit patterns inside list values
    survive bit-exactly, including empty lists."""
    rng = np.random.default_rng(7)
    special64 = np.array(
        [0x7FF8000000000001, 0xFFF8DEADBEEF0000, 0x7FF0000000000000,
         0xFFF0000000000000, 0x8000000000000000, 0x0000000000000000],
        dtype=np.uint64,
    ).view(np.float64)
    special32 = np.array(
        [0x7FC00001, 0x7F800000, 0xFF800000, 0x80000000, 0x7FBEEF00],
        dtype=np.uint32,
    ).view(np.float32)
    rows64 = [special64.tolist(), [],
              rng.standard_normal(40).tolist(), [0.1, -0.0]]
    # build the f32 lists from raw numpy (no float64 detour — a cast would
    # quiet signaling-NaN payloads before the engine ever saw them)
    flat32 = np.concatenate([
        special32, np.float32([1.5]),
        rng.standard_normal(40).astype(np.float32),
    ])
    off32 = np.array([0, len(special32), len(special32) + 1,
                      len(special32) + 1, len(flat32)], dtype=np.int32)
    f_arr = pa.ListArray.from_arrays(
        pa.array(off32), pa.array(flat32, type=pa.float32())
    )
    tbl = pa.table({
        "d": pa.array(rows64, type=pa.list_(pa.float64())),
        "f": f_arr,
    })
    schema = [("d", "listf64"), ("f", "listf32")]
    back = _chunk_roundtrip(tbl, schema)
    _assert_list_bits_equal(back.column("d"), tbl.column("d"))
    _assert_list_bits_equal(back.column("f"), tbl.column("f"))


def test_nullable_float_lists_roundtrip():
    """Null list entries and null values INSIDE lists both round-trip (the
    same validity-bitmap machinery as int lists)."""
    tbl = pa.table({
        "e": pa.array(
            [[1.5, None, 2.5], None, [], [float("nan"), -0.0], None,
             [0.25] * 9],
            type=pa.list_(pa.float64()),
        ),
    })
    schema = [("e", "listf64")]
    back = _chunk_roundtrip(tbl, schema)
    got, want = back.column("e").combine_chunks(), tbl.column("e")
    assert np.array_equal(
        np.asarray(got.is_valid()), np.asarray(want.is_valid())
    )
    for g, w in zip(got.to_pylist(), want.to_pylist()):
        if w is None:
            assert g is None
            continue
        assert len(g) == len(w)
        for gv, wv in zip(g, w):
            if wv is None:
                assert gv is None
            else:
                assert np.float64(gv).view(np.uint64) == np.float64(
                    wv
                ).view(np.uint64)


def test_embeddings_store_roundtrip(spark, estore):
    src, out, tbl = estore
    assert store_schema(spark, out) == [
        ("vec_id", "int64"), ("embedding", "listf32"), ("label", "int32"),
    ]
    decoded = decode(spark, out)
    assert [f.simpleString() for f in decoded.schema.fields] == [
        "vec_id:bigint", "embedding:array<float>", "label:int",
    ]
    got = {r["vec_id"]: r for r in decoded.collect()}
    assert len(got) == N
    want = tbl["embedding"].combine_chunks()
    for i in range(N):
        g = np.array(got[i]["embedding"], dtype=np.float32)
        w = np.asarray(want[i].values, dtype=np.float32)
        assert np.array_equal(g.view(np.uint32), w.view(np.uint32))


def test_float_list_containment_predicate_and_pruning(spark, estore):
    """ranges= on the list column is value containment (any element in
    [lo, hi]) — zone-map pruned via the values payload's finite stats, then
    exactly filtered."""
    _, out, tbl = estore
    emb = np.stack(
        [np.asarray(c.values) for c in
         [tbl["embedding"].combine_chunks()[i] for i in range(N)]]
    )
    lo = 3.5
    want = sorted(int(i) for i in np.where((emb >= lo).any(axis=1))[0])
    got = decode(spark, out, ranges={"embedding": (lo, None)}).collect()
    assert sorted(r["vec_id"] for r in got) == want
    # stats on the values payload are finite floats
    m = spark.read.parquet(out + "/manifest/chunks")
    stats = [
        json.loads(r["stats"])
        for r in m.where(m["col"] == "embedding__values").collect()
    ]
    assert stats and all(
        isinstance(s["min"], float) and s["max"] >= s["min"] for s in stats
    )
    with pytest.raises(TypeError, match="int or float"):
        decode(spark, out, ranges={"embedding": ("x", None)})


def test_nan_list_chunk_goes_statless(spark, tmp_path):
    tbl = pa.table({
        "v": pa.array([[1.0, float("nan")], [2.0]],
                      type=pa.list_(pa.float64())),
    })
    src = str(tmp_path / "n.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "store")
    encode(spark, src, out, n_partitions=1)
    m = spark.read.parquet(out + "/manifest/chunks")
    stats = [json.loads(r["stats"])
             for r in m.where(m["col"] == "v__values").collect()]
    assert all(s["min"] is None and s["max"] is None for s in stats)
    # conservative keep + exact filter: NaN never matches a bound
    got = decode(spark, out, ranges={"v": (0.0, 1.5)}).collect()
    assert len(got) == 1


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="testdata absent"
)
def test_real_embeddings_table_bit_identity(spark):
    """The driver-generated embeddings.parquet (vec_id, array<float>, label)
    encodes through the rowgroup fast path and decodes bit-identically."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = "/tmp/clj-orc-listf-emb-" + spark.sparkContext.applicationId
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    try:
        encode(spark, src, out, n_partitions=2, resume=False)
        want = pq.read_table(src)
        got_df = decode(spark, out)
        got = pa.Table.from_pandas(
            got_df.toPandas().sort_values("vec_id").reset_index(drop=True),
            preserve_index=False,
        )
        assert got.num_rows == want.num_rows
        w_sorted = want.sort_by("vec_id")
        _assert_list_bits_equal(
            got.column("embedding").cast(pa.list_(pa.float32())),
            w_sorted.column("embedding").cast(pa.list_(pa.float32())),
        )
        assert np.array_equal(
            np.asarray(got.column("label")),
            np.asarray(w_sorted.column("label")),
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)

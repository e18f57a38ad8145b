"""Round 5: float/double columns through the engine codec core.

The reference's type dispatch table decodes ``float``/``double``
(`src/orc/col.clj:70-75,164-165`); until round 5 ``derive_schema`` rejected
them.  The engine encodes the column's exact IEEE-754 BIT PATTERN
(uint32/uint64 view) through the int codec stack plus the new byte-stream
split kernel — so NaN payload bits, ±0.0 and infinities round-trip exactly.
The reference's NaN→nil normalization (`src/orc/col.clj:73-74`) is
deliberately NOT replicated: the bit-identity contract forbids it.
"""

from __future__ import annotations

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

N = 240


def _float_table() -> pa.Table:
    rng = np.random.default_rng(11)
    n_tok = rng.integers(1, 20, N)
    # dyadic scores: exact in float64, exact through any engine
    score = (rng.integers(0, 4000, N) * 0.25).astype(np.float64)
    reading = (rng.normal(100, 5, N)).astype(np.float32)
    return pa.table({
        "doc_id": [f"doc-{i:05d}" for i in range(N)],
        "tokens": pa.array(
            [rng.integers(0, 50_000, k).tolist() for k in n_tok],
            type=pa.list_(pa.int32()),
        ),
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": [f"src{i % 3}" for i in range(N)],
        "score": pa.array(score, type=pa.float64()),
        "reading": pa.array(reading, type=pa.float32()),
    })


@pytest.fixture(scope="module")
def fstore(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("flt")
    src = str(d / "src.parquet")
    tbl = _float_table()
    pq.write_table(tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, tbl


def _chunk_roundtrip(tbl: pa.Table, schema) -> pa.Table:
    rows = _encode_chunk_rows(tbl, 0, 0, {}, "size", schema)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(rows[f.name], type=f.type) for f in OUT_SCHEMA],
        schema=OUT_SCHEMA,
    )
    return decode_chunk_table(pa.Table.from_batches([batch]), None, schema)


def _bits(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    np_f = a.to_numpy(zero_copy_only=False)
    return np_f.view(np.uint32 if np_f.dtype == np.float32 else np.uint64)


def test_nan_payload_bits_roundtrip_exactly():
    """NaN payloads (quiet, signaling, sign-bit set), ±inf, -0.0 and random
    bit patterns all survive bit-exactly — the engine must NOT replicate
    the reference's NaN→nil normalization (`src/orc/col.clj:73-74`)."""
    rng = np.random.default_rng(5)
    special = np.array(
        [0x7FF8000000000001, 0x7FF0000000000042, 0xFFF8DEADBEEF0000,
         0x7FF0000000000000, 0xFFF0000000000000,  # ±inf
         0x8000000000000000, 0x0000000000000000],  # -0.0, +0.0
        dtype=np.uint64,
    )
    bits64 = np.concatenate(
        [special, rng.integers(0, 2**63, 500, dtype=np.int64).view(np.uint64)]
    )
    f64 = bits64.view(np.float64)
    bits32 = np.array(
        [0x7FC00001, 0x7F800000, 0xFF800000, 0x80000000, 0x7FBEEF00],
        dtype=np.uint32,
    )
    f32 = np.concatenate(
        [bits32, rng.integers(0, 2**31, 500, dtype=np.int32)
         .astype(np.uint32)]
    ).view(np.float32)
    n = len(f64)
    tbl = pa.table({
        "d": pa.array(f64, type=pa.float64()),
        "f": pa.array(f32[:n] if len(f32) >= n else
                      np.resize(f32, n), type=pa.float32()),
    })
    schema = [("d", "float64"), ("f", "float32")]
    back = _chunk_roundtrip(tbl, schema)
    assert np.array_equal(_bits(back.column("d")), _bits(tbl.column("d")))
    assert np.array_equal(_bits(back.column("f")), _bits(tbl.column("f")))


def test_float_store_roundtrip(spark, fstore):
    src, out, tbl = fstore
    assert store_schema(spark, out) == [
        ("doc_id", "str"), ("tokens", "list32"), ("n_tok", "int32"),
        ("source", "str"), ("score", "float64"), ("reading", "float32"),
    ]
    decoded = decode(spark, out)
    assert [f.simpleString() for f in decoded.schema.fields] == [
        "doc_id:string", "tokens:array<int>", "n_tok:int", "source:string",
        "score:double", "reading:float",
    ]
    got = {r["doc_id"]: r for r in decoded.collect()}
    assert len(got) == N
    scores = tbl["score"].to_pylist()
    readings = tbl["reading"].to_numpy()
    for i in range(N):
        row = got[f"doc-{i:05d}"]
        assert row["score"] == scores[i]
        assert np.float32(row["reading"]).view(np.uint32) == readings[i].view(
            np.uint32
        )


def test_float_zone_map_pruning_and_filter(spark, fstore):
    _, out, tbl = fstore
    scores = tbl["score"].to_numpy()
    got = decode(spark, out, ranges={"score": (100.0, 500.0)}).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        f"doc-{i:05d}" for i in range(N) if 100.0 <= scores[i] <= 500.0
    )
    # int bounds accepted on float columns too
    got2 = decode(spark, out, ranges={"score": (100, 500)}).collect()
    assert len(got2) == len(got)
    # manifest stats recorded as finite floats
    m = spark.read.parquet(out + "/manifest/chunks")
    import json as _json

    stats = [
        _json.loads(r["stats"])
        for r in m.where(m["col"] == "score").collect()
    ]
    assert stats and all(
        isinstance(s["min"], float) and s["max"] >= s["min"] for s in stats
    )


def test_float_predicate_validation(spark, fstore):
    _, out, _ = fstore
    with pytest.raises(TypeError, match="int or float"):
        decode(spark, out, ranges={"score": ("a", None)})
    with pytest.raises(TypeError, match="bounds must be int"):
        decode(spark, out, ranges={"n_tok": (1.5, None)})


def test_nan_chunk_records_statless_zone_map(spark, tmp_path):
    """A chunk holding NaN/Inf gets null stats — conservatively kept by the
    pruner (Spark orders NaN greatest, so no finite [min,max] is sound)."""
    tbl = pa.table({
        "doc_id": [f"d{i}" for i in range(8)],
        "x": pa.array(
            [1.0, float("nan"), 2.0, float("inf"), 0.5, -1.0, 3.5, -0.0],
            type=pa.float64(),
        ),
    })
    src = str(tmp_path / "n.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "store")
    encode(spark, src, out, n_partitions=1)
    import json as _json

    m = spark.read.parquet(out + "/manifest/chunks")
    stats = [_json.loads(r["stats"]) for r in m.where(m["col"] == "x").collect()]
    assert all(s["min"] is None and s["max"] is None for s in stats)
    # the range predicate still decodes the chunk (conservative keep) and
    # filters exactly; NaN rows don't match a <= bound under Spark semantics
    got = decode(spark, out, ranges={"x": (0.0, 2.0)}).collect()
    assert sorted(r["doc_id"] for r in got) == ["d0", "d2", "d4", "d7"]


def test_byte_split_kernel_roundtrip_and_win():
    """ByteSplit round-trips any int dtype; on mantissa-dead doubles (half
    the byte planes constant) it beats plain by ~2x and gets selected."""
    from clj_orc_spark.kernels.split import ByteSplit
    from clj_orc_spark.selector import encode_column

    rng = np.random.default_rng(9)
    for dt in (np.uint8, np.int16, np.uint32, np.int64, np.uint64):
        a = rng.integers(0, 200, 3000).astype(dt)
        p, m = ByteSplit.encode(a)
        assert np.array_equal(ByteSplit.decode(p, m), a)
    for a in (np.empty(0, np.uint64), np.array([7], dtype=np.uint32)):
        p, m = ByteSplit.encode(a)
        assert np.array_equal(ByteSplit.decode(p, m), a)
    # mantissa-dead float64: value = 20-bit int + 0.5 → low 4 byte planes
    # constant zero, high cardinality (dict can't win), exponents spread
    # (whole-word FOR needs ~56 bits) — byte_split's home turf
    from clj_orc_spark.kernels import decode_any

    f = (rng.integers(0, 2**20, 50_000) + 0.5).astype(np.float64)
    u = f.view(np.uint64)
    payload, meta, sel = encode_column(u, "float")
    assert np.array_equal(decode_any(payload, meta), u)
    assert sel["codec"] == "byte_split", sel
    assert len(payload) < 0.6 * u.nbytes, (sel, len(payload))


def test_float_speed_policy_roundtrips():
    from clj_orc_spark.kernels import decode_any
    from clj_orc_spark.selector import encode_column

    rng = np.random.default_rng(13)
    u = rng.random(20_000).view(np.uint64)
    p, m, sel = encode_column(u, "float", policy="speed")
    assert np.array_equal(decode_any(p, m), u)

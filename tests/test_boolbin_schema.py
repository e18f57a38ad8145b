"""Round 5: boolean and binary columns through the engine codec core.

The reference's type dispatch table decodes ``:boolean`` (as long 0/1) and
``:binary``/``:char``/``:varchar`` (as bytes) — `src/orc/col.clj:157-175`.
Until now ``derive_schema`` rejected both.  The engine stores booleans as
int32 0/1 through the int codec stack (RLE crushes runs, 1-bit FOR handles
random flags) with the ``bool`` kind pinned in the descriptor so decode
restores arrow ``bool_`` exactly; binary columns ride the existing
variable-width byte path (StringCol layout is offsets+bytes, identical for
utf8 and raw bytes — FSST/dict operate on bytes either way) and decode back
as arrow ``binary``.  The reference's ``:decimal``/``:uniontype`` entries
map to nil (unsupported) in its own table, so they stay loud plan-time
errors here too.
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

N = 260


def _bb_table(with_nulls: bool = False) -> pa.Table:
    rng = np.random.default_rng(23)
    n_tok = rng.integers(1, 20, N)
    flags = (rng.integers(0, 2, N) == 1)
    blobs = [rng.integers(0, 256, int(k) % 17).astype(np.uint8).tobytes()
             for k in n_tok * 3]
    if with_nulls:
        flags = [None if i % 7 == 0 else bool(flags[i]) for i in range(N)]
        blobs = [None if i % 5 == 0 else blobs[i] for i in range(N)]
    return pa.table({
        "doc_id": [f"doc-{i:05d}" for i in range(N)],
        "tokens": pa.array(
            [rng.integers(0, 50_000, k).tolist() for k in n_tok],
            type=pa.list_(pa.int32()),
        ),
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": [f"src{i % 3}" for i in range(N)],
        "flag": pa.array(flags, type=pa.bool_()),
        "payload": pa.array(blobs, type=pa.binary()),
    })


def test_schema_derivation_bool_binary():
    sch = derive_schema(_bb_table().schema)
    assert sch[-2:] == [("flag", "bool"), ("payload", "binary")]
    assert derive_schema(pa.schema([
        pa.field("b", pa.large_binary()),
    ])) == [("b", "binary")]
    # fixed-size binary stays a loud plan-time error (decode would widen it)
    with pytest.raises(ValueError, match="unsupported"):
        derive_schema(pa.schema([pa.field("x", pa.binary(16))]))


def _chunk_roundtrip(tbl: pa.Table, schema) -> pa.Table:
    rows = _encode_chunk_rows(tbl, 0, 0, {}, "size", schema)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(rows[f.name], type=f.type) for f in OUT_SCHEMA],
        schema=OUT_SCHEMA,
    )
    return decode_chunk_table(pa.Table.from_batches([batch]), None, schema)


def test_chunk_roundtrip_bit_identical():
    tbl = _bb_table()
    out = _chunk_roundtrip(tbl, derive_schema(tbl.schema))
    for name in tbl.column_names:
        assert out.column(name).combine_chunks().equals(
            tbl.column(name).combine_chunks()
        ), name


def test_chunk_roundtrip_with_nulls():
    tbl = _bb_table(with_nulls=True)
    out = _chunk_roundtrip(tbl, derive_schema(tbl.schema))
    for name in ("flag", "payload"):
        assert out.column(name).combine_chunks().equals(
            tbl.column(name).combine_chunks()
        ), name


def test_bool_edge_runs_and_constant():
    """All-true, all-false, and long-run bool columns — the RLE sweet spot —
    plus empty binary rows and a zero-row chunk."""
    for flags in (
        [True] * 64,
        [False] * 64,
        [True] * 40 + [False] * 24,
    ):
        tbl = pa.table({
            "flag": pa.array(flags, type=pa.bool_()),
            "payload": pa.array(
                [b"" if i % 2 else b"\x00\xff" for i in range(len(flags))],
                type=pa.binary(),
            ),
        })
        out = _chunk_roundtrip(tbl, derive_schema(tbl.schema))
        assert out.column("flag").combine_chunks().equals(
            tbl.column("flag").combine_chunks()
        )
        assert out.column("payload").combine_chunks().equals(
            tbl.column("payload").combine_chunks()
        )


@pytest.fixture(scope="module")
def bbstore(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bb")
    src = str(d / "src.parquet")
    tbl = _bb_table()
    pq.write_table(tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, tbl


def test_store_roundtrip_e2e(spark, bbstore):
    src, out, tbl = bbstore
    assert store_schema(spark, out)[-2:] == [
        ("flag", "bool"), ("payload", "binary"),
    ]
    dec = decode(spark, out)
    assert dict(dec.dtypes)["flag"] == "boolean"
    assert dict(dec.dtypes)["payload"] == "binary"
    got = {r["doc_id"]: r for r in dec.collect()}
    assert len(got) == N
    for i in range(N):
        row = got[f"doc-{i:05d}"]
        assert row["flag"] == tbl["flag"][i].as_py()
        assert row["payload"] == tbl["payload"][i].as_py()


def test_bool_zone_map_pruning(spark, bbstore):
    """ranges={'flag': (1, 1)} decodes exactly the true rows; an
    all-false store prunes every chunk through the int 0/1 zone maps."""
    _, out, tbl = bbstore
    dec = decode(spark, out, ranges={"flag": (1, 1)})
    n_true = sum(1 for v in tbl["flag"].to_pylist() if v)
    assert dec.count() == n_true
    assert all(r["flag"] for r in dec.select("flag").collect())


def test_binary_isin_exact_filter(spark, bbstore):
    _, out, tbl = bbstore
    want = tbl["payload"][0].as_py()
    dec = decode(spark, out, isin={"payload": [want]})
    rows = dec.select("payload").collect()
    assert rows and all(bytes(r["payload"]) == want for r in rows)
    n_match = sum(1 for v in tbl["payload"].to_pylist() if v == want)
    assert len(rows) == n_match

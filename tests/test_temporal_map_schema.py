"""Round-5: date/timestamp kinds and map shredding through the engine store.

Completes the reference's type-dispatch table engine-side
(`src/orc/col.clj:156-172`): `:date`/`:timestamp` (kept typed, not
formatted to strings — the formatting parity lives in functions/parity.py)
and `:map` (walked per row/cell in the reference, `col.clj:94-108`; shredded
here into flat keys + values + offsets payloads, chunk-vectorized).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clj_orc_spark.pipeline import decode, encode
from clj_orc_spark.pipeline.decode import store_schema
from clj_orc_spark.pipeline.encode import (
    derive_schema,
    map_kinds,
    map_payload_names,
    physical_cols,
)

N = 500
EPOCH = datetime.date(1970, 1, 1)


def _table() -> pa.Table:
    rng = np.random.default_rng(11)
    days = rng.integers(17_000, 20_000, N).astype(np.int32)
    micros = rng.integers(1_500_000_000, 1_700_000_000, N) * 1_000_000 + \
        rng.integers(0, 1_000_000, N)  # sub-second micros must survive
    maps = []
    for i in range(N):
        if i % 13 == 0:
            maps.append(None)
        else:
            maps.append([(f"k{j}", None if (i + j) % 7 == 0 else i * 10 + j)
                         for j in range(i % 4)])
    return pa.table({
        "doc_id": [f"doc-{i:05d}" for i in range(N)],
        "d": pa.array(days, type=pa.int32()).cast(pa.date32()),
        "dn": pa.array(
            [None if i % 9 == 0 else int(days[i]) for i in range(N)],
            type=pa.int32()).cast(pa.date32()),
        "tn": pa.array(micros, type=pa.int64()).cast(pa.timestamp("us")),
        "tz": pa.array(micros, type=pa.int64()).cast(
            pa.timestamp("us", tz="UTC")),
        "m": pa.array(maps, type=pa.map_(pa.string(), pa.int64())),
    })


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tm")
    src = str(d / "src.parquet")
    tbl = _table()
    pq.write_table(src_tbl := tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, src_tbl


def test_temporal_map_schema_derivation():
    sch = derive_schema(_table().schema)
    assert sch == [
        ("doc_id", "str"), ("d", "date32"), ("dn", "date32"),
        ("tn", "ts_us"), ("tz", "ts_us_utc"), ("m", "map<str,int64>"),
    ]
    assert map_kinds("map<str,int64>") == ("str", "int64")
    assert physical_cols(sch)[-3:] == map_payload_names("m")
    # ns timestamps (INT96 reads) are accepted — they coerce to micros
    assert derive_schema(pa.schema([
        pa.field("t", pa.timestamp("ns"))])) == [("t", "ts_us")]
    with pytest.raises(ValueError, match="timestamp zone"):
        derive_schema(pa.schema([
            pa.field("t", pa.timestamp("us", tz="America/New_York"))]))
    with pytest.raises(ValueError, match="map key"):
        derive_schema(pa.schema([
            pa.field("m", pa.map_(pa.float64(), pa.int32()))]))
    with pytest.raises(ValueError, match="map value"):
        derive_schema(pa.schema([
            pa.field("m", pa.map_(pa.string(), pa.list_(pa.int32())))]))


def test_temporal_map_roundtrip_exact(spark, store):
    src, out, tbl = store
    assert store_schema(spark, out) == [
        ("doc_id", "str"), ("d", "date32"), ("dn", "date32"),
        ("tn", "ts_us"), ("tz", "ts_us_utc"), ("m", "map<str,int64>"),
    ]
    decoded = decode(spark, out)
    types = {f.name: f.dataType.simpleString() for f in decoded.schema.fields}
    assert types == {
        "doc_id": "string", "d": "date", "dn": "date",
        "tn": "timestamp_ntz", "tz": "timestamp",
        "m": "map<string,bigint>",
    }
    got = {r["doc_id"]: r for r in decoded.collect()}
    assert len(got) == N
    for i in range(N):
        row = got[f"doc-{i:05d}"]
        assert row["d"] == tbl["d"][i].as_py(), i
        assert row["dn"] == tbl["dn"][i].as_py(), i
        assert row["tn"] == tbl["tn"][i].as_py(), i  # sub-second micros
        assert row["tz"].replace(tzinfo=datetime.timezone.utc) == \
            tbl["tz"][i].as_py(), i
        exp_m = tbl["m"][i].as_py()
        if exp_m is None:
            assert row["m"] is None, i
        else:
            assert row["m"] == dict(exp_m), i


def test_date_range_predicate_prunes_and_filters(spark, store):
    """Time-range scan — THE canonical 100 TB pruning case: bounds are the
    STORAGE ints (days since epoch), zone maps prune chunks, the exact
    filter re-applies the bound on the decoded date column."""
    src, out, tbl = store
    days = [d.as_py() for d in tbl["d"]]
    cut = sorted(days)[N // 2]
    lo = (cut - EPOCH).days
    sel = decode(spark, out, ranges={"d": (lo, None)})
    got = sorted(r["doc_id"] for r in sel.select("doc_id").collect())
    exp = sorted(f"doc-{i:05d}" for i in range(N) if days[i] >= cut)
    assert got == exp
    # and a timestamp bound in micros
    micros = [int(t.cast(pa.int64()).as_py()) for t in tbl["tn"]]
    mcut = sorted(micros)[N // 3]
    sel_t = decode(spark, out, ranges={"tn": (None, mcut)})
    assert sel_t.count() == sum(1 for v in micros if v <= mcut)


def test_map_predicates_rejected(spark, store):
    _, out, _ = store
    with pytest.raises(ValueError, match="struct/map column"):
        decode(spark, out, ranges={"m": (1, 2)})
    with pytest.raises(ValueError, match="struct/map column"):
        decode(spark, out, isin={"m": ["k0"]})


def test_temporal_fields_inside_struct_and_map(spark, tmp_dir):
    """Temporal kinds compose: a timestamp field inside a struct and date
    values inside a map shred/reassemble exactly like top-level columns."""
    import os

    days = np.arange(18_000, 18_000 + 200, dtype=np.int32)
    micros = (np.arange(200, dtype=np.int64) * 61_000_003
              + 1_600_000_000_000_000)
    st = pa.StructArray.from_arrays(
        [pa.array(micros).cast(pa.timestamp("us")),
         pa.array(np.arange(200, dtype=np.int32))],
        fields=[pa.field("seen", pa.timestamp("us")),
                pa.field("k", pa.int32())],
    )
    m = pa.array(
        [[("d", int(days[i]))] for i in range(200)],
        type=pa.map_(pa.string(), pa.date32()),
    )
    tbl = pa.table({
        "doc_id": [f"r{i}" for i in range(200)], "s": st, "m": m,
    })
    src = os.path.join(tmp_dir, "src.parquet")
    pq.write_table(tbl, src)
    out = os.path.join(tmp_dir, "store")
    encode(spark, src, out, n_partitions=1)
    assert store_schema(spark, out) == [
        ("doc_id", "str"), ("s", "struct<seen:ts_us,k:int32>"),
        ("m", "map<str,date32>"),
    ]
    rows = {r["doc_id"]: r for r in decode(spark, out).collect()}
    assert len(rows) == 200
    for i in (0, 7, 199):
        r = rows[f"r{i}"]
        assert r["s"]["seen"] == tbl["s"][i].as_py()["seen"], i
        assert r["m"]["d"] == (EPOCH + datetime.timedelta(int(days[i]))), i


def test_plan_report_prunes_on_time_range(spark, tmp_dir):
    """decode_plan_report answers time-range pruning from the manifest
    alone: a tight micros window must keep a strict subset of chunks."""
    import os

    from clj_orc_spark.pipeline.decode import decode_plan_report

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "ts", "event_type"
    ).orderBy("ts")  # time-clustered chunks, like any real log ingest
    src = os.path.join(tmp_dir, "ev.parquet")
    ev.coalesce(1).write.parquet(src)
    out = os.path.join(tmp_dir, "store")
    encode(spark, src, out, n_partitions=4, chunk_bytes=64 << 10)
    lo = 1_705_276_800_000_000  # 2024-01-15
    hi = 1_705_536_000_000_000  # 2024-01-18
    rep = decode_plan_report(spark, out, ranges={"ts": (lo, hi)})
    assert rep["chunks_kept"] < rep["chunks_total"], rep
    # and the pruned decode agrees with the unpruned filtered decode
    n_pruned = decode(spark, out, ranges={"ts": (lo, hi)}).count()
    n_exp = ev.where(
        "ts >= TIMESTAMP_NTZ'2024-01-15 00:00:00' AND "
        "ts <= TIMESTAMP_NTZ'2024-01-18 00:00:00'"
    ).count()
    assert n_pruned == n_exp > 0


def test_map_null_entry_ghost_values_dropped():
    """A writer may give a NULL map entry a non-empty offsets range (ghost
    values, permitted by the Arrow spec); the list-view flatten drops them
    at the CHUNK level, so the store holds only observable data and decode
    restores NULL entries as length-0 NULLs."""
    from clj_orc_spark.pipeline.decode import decode_chunk_table
    from clj_orc_spark.pipeline.encode import OUT_SCHEMA, _encode_chunk_rows

    keys = pa.array(["a", "g1", "g2", "b"])
    vals = pa.array([1, 98, 99, 2], type=pa.int64())
    entries = pa.StructArray.from_arrays(
        [keys, vals],
        fields=[pa.field("key", pa.string(), nullable=False),
                pa.field("value", pa.int64())],
    )
    off = np.array([0, 1, 3, 4], dtype=np.int32)  # middle entry: ghosts
    valid = np.packbits(np.array([1, 0, 1], dtype=bool),
                        bitorder="little").tobytes()
    m = pa.Array.from_buffers(
        pa.map_(pa.string(), pa.int64()), 3,
        [pa.py_buffer(valid), pa.py_buffer(off.tobytes())],
        children=[entries],
    )
    tbl = pa.table({"doc_id": ["a", "b", "c"], "m": m})
    schema = [("doc_id", "str"), ("m", "map<str,int64>")]
    rows = _encode_chunk_rows(tbl, part_id=0, seq=0, schema=schema)
    chunk = pa.table(
        {f.name: pa.array(rows[f.name], type=f.type) for f in OUT_SCHEMA}
    )
    dec = decode_chunk_table(chunk, None, schema)
    got = dict(zip(dec.column("doc_id").to_pylist(),
                   dec.column("m").to_pylist()))
    assert got == {"a": [("a", 1)], "b": None, "c": [("b", 2)]}

"""Round-5: RECURSIVE struct shredding — nested structs of any depth.

The reference decodes structs recursively per row (`src/orc/col.clj:83-92`);
the engine shreds every struct LEVEL into flat scalar payloads
(``parent__child__leaf``) plus a 0/1 present column per level, so
``s = null`` / ``s.b = null`` / ``s.b = {c: null}`` stay distinguishable
after the round trip and deep-field access at decode is a column prune.
"""

from __future__ import annotations

import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clj_orc_spark.pipeline import decode, encode
from clj_orc_spark.pipeline.encode import (
    derive_schema,
    physical_cols,
    struct_fields,
    struct_payload_names,
)

N = 400

NESTED_KIND = (
    "struct<a:int32,"
    "b:struct<c:str,d:struct<e:float64,f:date32,u:int64>>,"
    "g:bool>"
)


def _nested_table() -> pa.Table:
    """Token table + a 3-level struct with NULLs at every level and every
    leaf kind class (int / str / float / temporal / bool)."""
    rng = np.random.default_rng(11)
    n_tok = rng.integers(1, 20, N)
    metas = []
    for i in range(N):
        if i % 13 == 0:
            metas.append(None)  # null at the TOP level
        else:
            if i % 7 == 0:
                b = None  # null MID-level struct under a valid parent
            else:
                if i % 5 == 0:
                    d = None  # null INNER struct under two valid ancestors
                else:
                    d = {
                        "e": float("nan") if i % 17 == 0 else i * 0.25,
                        "f": datetime.date(2020, 1, 1)
                        + datetime.timedelta(days=i % 300),
                        "u": 10_000_000_000 + 3 * i,
                    }
                b = {"c": None if i % 11 == 0 else f"c{i % 37}", "d": d}
            metas.append({"a": i % 100, "b": b, "g": bool(i % 2)})
    meta_type = pa.struct([
        pa.field("a", pa.int32()),
        pa.field("b", pa.struct([
            pa.field("c", pa.string()),
            pa.field("d", pa.struct([
                pa.field("e", pa.float64()), pa.field("f", pa.date32()),
                pa.field("u", pa.int64()),
            ])),
        ])),
        pa.field("g", pa.bool_()),
    ])
    return pa.table({
        "doc_id": [f"doc-{i:05d}" for i in range(N)],
        "tokens": pa.array(
            [rng.integers(0, 50_000, k).tolist() for k in n_tok],
            type=pa.list_(pa.int32()),
        ),
        "meta": pa.array(metas, type=meta_type),
        "source": [f"src{i % 4}" for i in range(N)],
    })


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("struct_nested")
    src = str(d / "src.parquet")
    tbl = _nested_table()
    pq.write_table(tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, tbl


def test_nested_schema_derivation():
    sch = derive_schema(_nested_table().schema)
    assert sch[2] == ("meta", NESTED_KIND)
    # bracket-aware field split: commas inside the nested kind don't break
    assert struct_fields(NESTED_KIND) == [
        ("a", "int32"),
        ("b", "struct<c:str,d:struct<e:float64,f:date32,u:int64>>"),
        ("g", "bool"),
    ]
    assert struct_payload_names("meta", NESTED_KIND) == (
        "meta__a", "meta__b__c", "meta__b__d__e", "meta__b__d__f",
        "meta__b__d__u", "meta__b__d__present", "meta__b__present",
        "meta__g", "meta__present",
    )
    # a physical collision with a NESTED leaf is still caught at plan time
    with pytest.raises(ValueError, match="collision"):
        derive_schema(pa.schema([
            pa.field("m", pa.struct([pa.field("b", pa.struct(
                [pa.field("c", pa.int32())]
            ))])),
            pa.field("m__b__c", pa.int64()),
        ]))
    # non-scalar, non-struct nested fields stay a loud plan-time error
    with pytest.raises(ValueError, match="unsupported struct field"):
        derive_schema(pa.schema([pa.field("s", pa.struct([
            pa.field("b", pa.struct([pa.field("xs", pa.list_(pa.int32()))]))
        ]))]))
    # '.' in a field name would make the store undecodable (it is the
    # select-DDL and predicate-path separator) — rejected at plan time
    with pytest.raises(ValueError, match="field-path separator"):
        derive_schema(pa.schema([pa.field("s", pa.struct(
            [pa.field("a.b", pa.int32())]
        ))]))


def test_nested_roundtrip_exact(spark, store):
    src, out, _ = store
    dec = decode(spark, out)
    ref = spark.read.parquet(src)
    assert dec.schema == ref.schema
    assert dec.exceptAll(ref).isEmpty() and ref.exceptAll(dec).isEmpty()


def test_nested_null_levels_distinguished(spark, store):
    """s = null vs s.b = null vs s.b.d = null vs leaf-null must all survive
    the round trip — each level's present column carries its own validity."""
    _, out, tbl = store
    metas = tbl["meta"].to_pylist()
    got = {
        r["doc_id"]: r["meta"]
        for r in decode(spark, out).select("doc_id", "meta").collect()
    }

    def norm(v):
        if v is None or isinstance(v, (str, int, bool, datetime.date)):
            return v
        if isinstance(v, float):
            return "nan" if v != v else v
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        return {k: norm(x) for k, x in v.asDict().items()}

    for i, want in enumerate(metas):
        assert norm(got[f"doc-{i:05d}"]) == norm(want), i


def test_nested_field_predicates(spark, store):
    """ranges/isin reach through ANY depth of shredding with SQL WHERE
    semantics (a null at any ancestor level never matches), and the leaf's
    own zone maps prune manifest-side."""
    _, out, tbl = store
    metas = tbl["meta"].to_pylist()

    # Spark float semantics: NaN sorts GREATER than any number, so a
    # lower-bound range keeps NaN leaves — the expectation mirrors that
    sel = decode(spark, out, ranges={"meta.b.d.e": (30.0, None)})
    exp = sorted(
        f"doc-{i:05d}" for i, v in enumerate(metas)
        if v is not None and v["b"] is not None and v["b"]["d"] is not None
        and v["b"]["d"]["e"] is not None
        and (math.isnan(v["b"]["d"]["e"]) or v["b"]["d"]["e"] >= 30.0)
    )
    assert sorted(r["doc_id"] for r in sel.select("doc_id").collect()) == exp

    sel2 = decode(spark, out, isin={"meta.b.c": ["c1", "c2"]})
    exp2 = sorted(
        f"doc-{i:05d}" for i, v in enumerate(metas)
        if v is not None and v["b"] is not None
        and v["b"]["c"] in ("c1", "c2")
    )
    assert sorted(
        r["doc_id"] for r in sel2.select("doc_id").collect()
    ) == exp2

    # deep-leaf plan-report pruning: u is monotone in the row index, so a
    # tight window must keep a strict subset of chunks without reading any
    # data (e's zone maps are stat-less wherever a chunk holds NaN — the
    # conservative keep is the correct behavior there, not a pruning miss)
    from clj_orc_spark.pipeline.decode import decode_plan_report

    rep = decode_plan_report(
        spark, out, ranges={"meta.b.d.u": (10_000_000_000, 10_000_000_090)}
    )
    assert rep["chunks_kept"] < rep["chunks_total"], rep

    # loud errors: unknown field mid-path, path through a scalar leaf,
    # path stopping at a struct
    with pytest.raises(ValueError, match="no field"):
        decode(spark, out, ranges={"meta.b.nope": (1, 2)})
    with pytest.raises(ValueError, match="scalar field, not a struct"):
        decode(spark, out, ranges={"meta.a.x": (1, 2)})
    with pytest.raises(ValueError, match="targets a struct"):
        decode(spark, out, ranges={"meta.b.d": (1, 2)})


def test_nested_column_pruning(spark, store):
    """Selecting scalar columns only must not touch any struct payload; the
    store stays readable with the struct column pruned away."""
    _, out, tbl = store
    got = decode(spark, out, columns=["doc_id", "source"])
    assert got.columns == ["doc_id", "source"]
    assert got.count() == tbl.num_rows

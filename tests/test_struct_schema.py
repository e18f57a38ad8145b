"""Round-5: struct shredding through the engine store (one-level cases;
see test_struct_nested.py for arbitrary depth).

The reference decodes structs recursively per row (`src/orc/col.clj:83-92`);
the engine shreds scalar fields into their own payload columns
(``name__field`` + a ``name__present`` 0/1 validity column, RLE-crushed) so
field access at decode is a column-pruned kernel run, not a row pivot.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clj_orc_spark.pipeline import decode, encode
from clj_orc_spark.pipeline.decode import store_schema
from clj_orc_spark.pipeline.encode import (
    derive_schema,
    physical_cols,
    struct_fields,
)

N = 400


def _struct_table() -> pa.Table:
    """Token table + a struct column exercising every scalar field kind,
    with NULLs at the struct level AND inside fields."""
    rng = np.random.default_rng(7)
    n_tok = rng.integers(1, 30, N)
    metas = []
    for i in range(N):
        if i % 13 == 0:
            metas.append(None)  # null struct
        else:
            metas.append({
                "lang": None if i % 11 == 0 else ("en", "de", "fr")[i % 3],
                "year": None if i % 7 == 0 else 2000 + (i % 25),
                "uid": 10_000_000_000 + 3 * i,
                "score": float("nan") if i % 17 == 0 else i * 0.25,
            })
    meta_type = pa.struct([
        pa.field("lang", pa.string()), pa.field("year", pa.int32()),
        pa.field("uid", pa.int64()), pa.field("score", pa.float64()),
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
    d = tmp_path_factory.mktemp("struct")
    src = str(d / "src.parquet")
    tbl = _struct_table()
    pq.write_table(tbl, src)
    out = str(d / "store")
    encode(spark, src, out, n_partitions=3)
    return src, out, tbl


STRUCT_KIND = "struct<lang:str,year:int32,uid:int64,score:float64>"


def test_struct_schema_derivation():
    sch = derive_schema(_struct_table().schema)
    assert sch == [
        ("doc_id", "str"), ("tokens", "list32"),
        ("meta", STRUCT_KIND), ("source", "str"),
    ]
    assert struct_fields(STRUCT_KIND) == [
        ("lang", "str"), ("year", "int32"),
        ("uid", "int64"), ("score", "float64"),
    ]
    assert physical_cols(sch) == (
        "doc_id", "token_values", "offsets", "meta__lang", "meta__year",
        "meta__uid", "meta__score", "meta__present", "source",
    )
    # nested non-scalar fields are a loud plan-time error, not silent data
    with pytest.raises(ValueError, match="unsupported struct field"):
        derive_schema(pa.schema([pa.field("s", pa.struct(
            [pa.field("xs", pa.list_(pa.int32()))]
        ))]))
    # physical-name collision with a shredded field is caught at plan time
    with pytest.raises(ValueError, match="collision"):
        derive_schema(pa.schema([
            pa.field("m", pa.struct([pa.field("x", pa.int32())])),
            pa.field("m__x", pa.int64()),
        ]))


def test_struct_roundtrip_exact(spark, store):
    src, out, tbl = store
    assert store_schema(spark, out) == [
        ("doc_id", "str"), ("tokens", "list32"),
        ("meta", STRUCT_KIND), ("source", "str"),
    ]
    decoded = decode(spark, out)
    assert dict(
        (f.name, f.dataType.simpleString()) for f in decoded.schema.fields
    )["meta"] == "struct<lang:string,year:int,uid:bigint,score:double>"
    got = {r["doc_id"]: r for r in decoded.collect()}
    assert len(got) == N
    for i in range(N):
        row = got[f"doc-{i:05d}"]
        exp = tbl["meta"][i].as_py()
        if exp is None:
            assert row["meta"] is None, i
            continue
        m = row["meta"].asDict()
        for k in ("lang", "year", "uid"):
            assert m[k] == exp[k], (i, k)
        if exp["score"] is not None and math.isnan(exp["score"]):
            assert math.isnan(m["score"]), i  # NaN survives, not nulled
        else:
            assert m["score"] == exp["score"], i


def test_struct_column_pruning_and_predicates(spark, store):
    _, out, tbl = store
    slim = decode(spark, out, columns=["doc_id", "meta"])
    assert [f.name for f in slim.schema.fields] == ["doc_id", "meta"]
    n_null = slim.where("meta IS NULL").count()
    assert n_null == sum(1 for v in tbl["meta"].to_pylist() if v is None)
    # SQL null semantics on a shredded field: count skips nulls
    from pyspark.sql import functions as F

    cnt = slim.agg(F.count("meta.lang")).first()[0]
    assert cnt == sum(
        1 for v in tbl["meta"].to_pylist()
        if v is not None and v["lang"] is not None
    )
    with pytest.raises(ValueError, match="struct/map column"):
        decode(spark, out, ranges={"meta": (1, 2)})
    with pytest.raises(ValueError, match="struct/map column"):
        decode(spark, out, isin={"meta": ["x"]})


def test_struct_field_predicates_filter_and_prune(spark, store):
    """``ranges={'meta.year': ...}`` reaches INTO the shredded struct: the
    field's own zone maps prune chunks manifest-side and the exact filter
    re-applies on the nested column — SQL WHERE semantics (NULL field or
    NULL struct never matches)."""
    _, out, tbl = store
    metas = tbl["meta"].to_pylist()

    sel = decode(spark, out, ranges={"meta.year": (2010, None)})
    exp = sorted(
        f"doc-{i:05d}" for i, v in enumerate(metas)
        if v is not None and v["year"] is not None and v["year"] >= 2010
    )
    assert sorted(r["doc_id"] for r in sel.select("doc_id").collect()) == exp

    sel2 = decode(spark, out, isin={"meta.lang": ["de"]})
    exp2 = sorted(
        f"doc-{i:05d}" for i, v in enumerate(metas)
        if v is not None and v["lang"] == "de"
    )
    assert sorted(
        r["doc_id"] for r in sel2.select("doc_id").collect()
    ) == exp2

    # plan report answers from the manifest; uid is monotone per row so a
    # tight uid window must keep a strict subset of chunks
    from clj_orc_spark.pipeline.decode import decode_plan_report

    rep = decode_plan_report(
        spark, out, ranges={"meta.uid": (10_000_000_000, 10_000_000_090)}
    )
    assert rep["chunks_kept"] < rep["chunks_total"], rep

    with pytest.raises(ValueError, match="no field"):
        decode(spark, out, ranges={"meta.nope": (1, 2)})
    with pytest.raises(TypeError, match="list of str"):
        decode(spark, out, isin={"meta.lang": [3]})


def test_struct_present_column_is_tiny(spark, store):
    """The 0/1 present column must RLE to near nothing on mostly-valid
    data — struct-level validity cannot cost a real stream at 100 TB."""
    _, out, _ = store
    m = spark.read.parquet(out + "/manifest/chunks")
    rows = m.where("col = 'meta__present'").select(
        "enc_bytes", "n_rows").collect()
    assert rows
    for r in rows:
        assert r["enc_bytes"] <= max(64, r["n_rows"] // 8), dict(r.asDict())

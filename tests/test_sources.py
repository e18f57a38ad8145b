"""Reference-parity tests for the ORC source and stream shims.

These replicate the reference's OWN golden test cases — same fixture schema
``struct<x:int,y:int>``, same deterministic generators (identity, 2x), same
batch/byte-limit boundary matrix, same expected stream elements — from
`test/orc/read_test.clj:16-101` and `test/orc/json_test.clj:17-99` (byte-exact
chunk strings for the JSON grammar).
"""

import os

import pyarrow as pa
import pyarrow.orc as paorc
import pytest

from clj_orc_spark.sources import configure, json_stream, read_orc, read_stream


def _fixture_orc(tmp_dir: str, n_rows: int) -> str:
    """The reference fixture writer: x=identity, y=2x (read_test.clj:26-27)."""
    path = os.path.join(tmp_dir, "test.orc")
    x = list(range(n_rows))
    table = pa.table(
        {"x": pa.array(x, type=pa.int32()),
         "y": pa.array([2 * v for v in x], type=pa.int32())}
    )
    paorc.write_table(table, path)
    return path


def test_read_stream_map_batch4(spark, tmp_dir):
    """read_test.clj test-1: 10 rows, bat-size 4 → partial last batch."""
    src = _fixture_orc(tmp_dir, 10)
    ch = read_stream(spark, src, coll_type="map", bat_size=4)
    assert next(ch) == "Read Stream"
    assert next(ch) == {0: "x", 1: "y"}
    assert next(ch) == {"i": 1, "rows": [{0: 0, 1: 0}, {0: 1, 1: 2}, {0: 2, 1: 4}, {0: 3, 1: 6}]}
    assert next(ch) == {"i": 2, "rows": [{0: 4, 1: 8}, {0: 5, 1: 10}, {0: 6, 1: 12}, {0: 7, 1: 14}]}
    assert next(ch) == {"i": 3, "rows": [{0: 8, 1: 16}, {0: 9, 1: 18}]}
    with pytest.raises(StopIteration):
        next(ch)


def test_read_stream_exact_multiple_and_single_batch(spark, tmp_dir):
    """read_test.clj test-2/test-3: exact multiple, single batch."""
    src = _fixture_orc(tmp_dir, 10)
    chunks = [c for c in read_stream(spark, src, coll_type="map", bat_size=5)][2:]
    assert [c["i"] for c in chunks] == [1, 2]
    assert len(chunks[0]["rows"]) == 5 and len(chunks[1]["rows"]) == 5

    src5 = _fixture_orc(tmp_dir, 5)  # overwrites; sequential use is fine
    chunks = [c for c in read_stream(spark, src5, coll_type="map", bat_size=5)][2:]
    assert [c["i"] for c in chunks] == [1]


def test_read_stream_empty(spark, tmp_dir):
    """read_test.clj test-4: empty file → header + {:i 1 :rows []}."""
    src = _fixture_orc(tmp_dir, 0)
    ch = read_stream(spark, src, coll_type="map", bat_size=5)
    assert next(ch) == "Read Stream"
    assert next(ch) == {0: "x", 1: "y"}
    assert next(ch) == {"i": 1, "rows": []}
    with pytest.raises(StopIteration):
        next(ch)


def test_read_stream_vector(spark, tmp_dir):
    """read_test.clj test-read->vector: positional vectors."""
    src = _fixture_orc(tmp_dir, 4)
    ch = read_stream(spark, src, coll_type="vector", bat_size=4)
    next(ch), next(ch)
    assert next(ch) == {"i": 1, "rows": [[0, 0], [1, 2], [2, 4], [3, 6]]}


def test_read_stream_custom_meta(spark, tmp_dir):
    """read_test.clj:176,187: user meta fn replaces the default."""
    src = _fixture_orc(tmp_dir, 2)
    ch = read_stream(spark, src, coll_type="map", bat_size=5,
                     meta=lambda schema: f"{len(schema.fields)} Columns")
    assert next(ch) == "2 Columns"


def test_json_stream_map_multichunk_byte_exact(spark, tmp_dir):
    """json_test.clj:34-40 — byte-exact chunk grammar, limit 25, bat 2."""
    src = _fixture_orc(tmp_dir, 10)
    ch = json_stream(spark, src, 25, coll_type="map", bat_size=2)
    assert next(ch) == "JSON Stream"
    assert next(ch) == {"i": 1, "chunk": '[{"0":"x","1":"y"},{"0":0,"1":0},{"0":1,"1":2},{"0":2,"1":4},{"0":3,"1":6}'}
    assert next(ch) == {"i": 2, "chunk": ',{"0":4,"1":8},{"0":5,"1":10}'}
    assert next(ch) == {"i": 3, "chunk": ',{"0":6,"1":12},{"0":7,"1":14}'}
    assert next(ch) == {"i": 4, "chunk": ',{"0":8,"1":16},{"0":9,"1":18}'}
    assert next(ch) == {"i": 5, "chunk": "]"}
    with pytest.raises(StopIteration):
        next(ch)


def test_json_stream_single_chunk_and_empty(spark, tmp_dir):
    """json_test.clj:57-60, 96-99."""
    src = _fixture_orc(tmp_dir, 2)
    chunks = list(json_stream(spark, src, 25, coll_type="map", bat_size=2))
    assert chunks == ["JSON Stream",
                      {"i": 1, "chunk": '[{"0":"x","1":"y"},{"0":0,"1":0},{"0":1,"1":2}]'}]

    src0 = _fixture_orc(tmp_dir, 0)
    chunks = list(json_stream(spark, src0, 25, coll_type="map", bat_size=2))
    assert chunks == ["JSON Stream", {"i": 1, "chunk": '[{"0":"x","1":"y"}]'}]


def test_json_stream_vector_byte_exact(spark, tmp_dir):
    """json_test.clj:119-124."""
    src = _fixture_orc(tmp_dir, 10)
    ch = json_stream(spark, src, 25, coll_type="vector", bat_size=2)
    assert next(ch) == "JSON Stream"
    assert next(ch) == {"i": 1, "chunk": '[["x","y"],[0,0],[1,2],[2,4],[3,6]'}
    assert next(ch) == {"i": 2, "chunk": ",[4,8],[5,10],[6,12],[7,14]"}
    assert next(ch) == {"i": 3, "chunk": ",[8,16],[9,18]]"}


def test_json_stream_reassembly(spark, tmp_dir):
    """Concatenated chunks parse back to header + rows (the grammar's point)."""
    import json

    src = _fixture_orc(tmp_dir, 10)
    parts = [c["chunk"] for c in json_stream(spark, src, 25, bat_size=3)
             if isinstance(c, dict)]
    whole = json.loads("".join(parts))
    assert whole[0] == ["x", "y"]
    assert whole[1:] == [[i, 2 * i] for i in range(10)]


def test_configure_obfuscates_private(spark):
    """read.clj:27-49: private values obfuscated in the loggable view."""
    settings, loggable = configure({
        "fs.s3a.access.key": {"value": "AKIA123", "private": True},
        "fs.s3a.endpoint": "s3.amazonaws.com",
    })
    assert settings["fs.s3a.access.key"] == "AKIA123"
    assert loggable["fs.s3a.access.key"] == "*****"
    assert loggable["fs.s3a.endpoint"] == "s3.amazonaws.com"


def test_read_orc_schema_validation(spark, tmp_dir):
    src = _fixture_orc(tmp_dir, 3)
    df = read_orc(spark, src, schema="x int, y int")
    assert df.count() == 3
    with pytest.raises(ValueError, match="not in ORC file schema"):
        read_orc(spark, src, schema="nope int")


def test_plan_auditors(spark):
    from clj_orc_spark.plans import (
        assert_columns_pruned,
        assert_filter_pushed,
        wholestage_codegen_count,
    )
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        .where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    assert_filter_pushed(df, "l_quantity")
    assert_columns_pruned(df, ["l_orderkey", "l_quantity"], ["l_extendedprice"])
    assert wholestage_codegen_count(df) >= 1


def test_headline_queries_run_in_codegen(spark):
    """The hot path of every headline query must sit in ≥1 WholeStageCodegen
    span of the EXECUTED plan — the pre-execution AQE plan shows no spans at
    all (the round-1 PLANS.md 'spans: 0' mistake)."""
    import __spark_entry__ as entry_mod
    from clj_orc_spark.plans import executed_codegen_count

    qs = entry_mod.queries()
    for name in ("filter_agg", "orders_join", "pricing_summary", "embed_topk"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert executed_codegen_count(df) >= 1, name


# --- token-table source (parquet path / Iceberg identifier) -----------------


def test_read_token_table_parquet(spark, token_table_dir):
    from clj_orc_spark.sources import read_token_table

    df = read_token_table(spark, os.path.join(token_table_dir, "tokens.parquet"))
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]
    assert df.count() == 5_000


def test_read_token_table_rejects_wrong_schema(spark):
    import pytest

    from clj_orc_spark.sources import validate_token_schema

    df = spark.createDataFrame([("a", 1)], "doc_id string, n_tok int")
    with pytest.raises(ValueError, match="missing column 'tokens'"):
        validate_token_schema(df)


def test_read_token_table_iceberg_gated(spark):
    """No Iceberg connector in this container: the identifier path must fail
    with a message naming the missing runtime jar, not a raw Py4J error."""
    import pytest

    from clj_orc_spark.sources import read_token_table

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_token_table(spark, "catalog.db.tokens")

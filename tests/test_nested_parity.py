"""Nested-type + temporal decode parity (FIXTURES.md F4).

The reference *declares* struct/map/array/date/timestamp decode
(`README.md:195-228`, parsers at `src/orc/col.clj:58-121`) but tests none of
it (`test/orc/col_test.clj:17-19` is commented out — SURVEY.md §5 coverage
gap).  Spark reads nested ORC natively; these tests pin the behavior the
reference only promises, plus the divergences we chose deliberately:

* struct decode keeps field names (the reference flattens to positional
  vectors, losing names — `src/orc/col.clj:83-92`);
* NaN survives (the reference nils it — `src/orc/col.clj:70-75`; bit identity
  wins, `nan_to_null` exists for opt-in parity).
"""

import datetime
import math
import os

import pyarrow as pa
import pyarrow.orc as paorc
from pyspark.sql import functions as F

from clj_orc_spark.functions.parity import date_to_string, nan_to_null, timestamp_to_string
from clj_orc_spark.sources import read_orc, read_stream


def _write_nested_orc(tmp_dir: str) -> str:
    path = os.path.join(tmp_dir, "nested.orc")
    table = pa.table({
        "s": pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
                      type=pa.struct([("a", pa.int32()), ("b", pa.string())])),
        "m": pa.array([{"k1": 10}, {"k2": 20}],
                      type=pa.map_(pa.string(), pa.int32())),
        "l": pa.array([[1, 2, 3], [4]], type=pa.list_(pa.int32())),
        "ll": pa.array([[[1], [2, 3]], [[4, 5]]],
                       type=pa.list_(pa.list_(pa.int32()))),
    })
    paorc.write_table(table, path)
    return path


def test_nested_struct_map_list_decode(spark, tmp_dir):
    """T6/T7/T8 parity (`src/orc/col.clj:83-121`) via native Spark ORC read."""
    df = read_orc(spark, _write_nested_orc(tmp_dir))
    rows = df.orderBy("s.a").collect()
    # struct: names preserved (reference loses them — improvement noted)
    assert rows[0]["s"]["a"] == 1 and rows[0]["s"]["b"] == "x"
    # map: scalar keys, offset/length slicing semantics
    assert rows[0]["m"] == {"k1": 10} and rows[1]["m"] == {"k2": 20}
    # list + nested list-of-list (README.md:195-228 arbitrary depth)
    assert rows[0]["l"] == [1, 2, 3] and rows[1]["l"] == [4]
    assert rows[0]["ll"] == [[1], [2, 3]] and rows[1]["ll"] == [[4, 5]]


def test_nested_through_stream_protocol(spark, tmp_dir):
    """Nested values flow through the reference stream protocol too."""
    src = _write_nested_orc(tmp_dir)
    chunks = list(read_stream(spark, src, coll_type="vector", bat_size=10))
    assert chunks[1] == ["s", "m", "l", "ll"]
    rows = chunks[2]["rows"]
    assert rows[0][2] == [1, 2, 3]


def test_date_timestamp_format_parity(spark, tmp_dir):
    """T3/T4 (`src/orc/col.clj:58-68`): days→'yyyy-MM-dd',
    millis→'yyyy-MM-dd HH:mm:ss', UTC."""
    path = os.path.join(tmp_dir, "temporal.orc")
    paorc.write_table(pa.table({
        "d": pa.array([datetime.date(1970, 1, 1), datetime.date(2024, 2, 29)]),
        "t": pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5),
                       datetime.datetime(1999, 12, 31, 23, 59, 59)]),
    }), path)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_orc(spark, path).select(
        date_to_string(F.col("d")).alias("ds"),
        timestamp_to_string(F.col("t")).alias("ts"),
    )
    got = [(r["ds"], r["ts"]) for r in df.collect()]
    assert got == [("1970-01-01", "2024-01-02 03:04:05"),
                   ("2024-02-29", "1999-12-31 23:59:59")]


def test_nan_preserved_by_default_nulled_on_request(spark, tmp_dir):
    """T5 divergence (`src/orc/col.clj:70-75`): we keep NaN bit-identical;
    `nan_to_null` reproduces the reference's normalization on demand."""
    path = os.path.join(tmp_dir, "doubles.orc")
    paorc.write_table(pa.table({"v": pa.array([1.5, float("nan"), -0.0])}), path)
    df = read_orc(spark, path)
    vals = [r["v"] for r in df.collect()]
    assert math.isnan(vals[1])  # NOT normalized away
    assert str(vals[2]) == "-0.0"  # signed zero survives
    nulled = [r["n"] for r in df.select(nan_to_null(F.col("v")).alias("n")).collect()]
    assert nulled[1] is None  # reference behavior, opt-in


def test_unsupported_type_throws_at_plan_time(spark, tmp_dir):
    """T10 (`src/orc/col.clj:200-203`): unsupported/unknown columns fail at
    plan build, not silently."""
    import pytest

    path = os.path.join(tmp_dir, "simple.orc")
    paorc.write_table(pa.table({"x": pa.array([1], type=pa.int32())}), path)
    with pytest.raises(ValueError):
        read_orc(spark, path, schema="y decimal(10,2)")

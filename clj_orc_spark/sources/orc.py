"""ORC source: the reference's reader surface (S1–S5), Spark-native.

* :func:`configure` — the reference's Hadoop config builder
  (`src/orc/read.clj:27-49`): k/v map → ``spark.hadoop.*`` settings, with
  ``private`` keys obfuscated in the loggable rendering (the reference
  obfuscates values marked ``:private``, e.g. S3 secrets,
  `src/orc/read.clj:33-38`; S3A example `README.md:95-101`).
* :func:`read_orc` — `OrcFile/createReader` + user schema mapping
  (`src/orc/read.clj:51-57`) becomes ``spark.read.schema(...).orc(path)``:
  unlike the reference, a declared schema is *validated* against the file
  (the reference silently mis-decodes on mismatch — SURVEY.md §1.4).
* :func:`read_stream` — API-parity shim for ``orc.read/start``
  (`src/orc/read.clj:65-112`): yields the same stream protocol
  (metadata, header record, ``{"i": n, "rows": [...]}`` chunks) with
  ``coll_type`` map/vector row shapes (`src/orc/core.clj:34-55`).
* :func:`json_stream` — parity shim for ``orc.json/start``
  (`src/orc/json.clj:48-101`): byte-limited JSON chunks with the exact
  reassembly grammar (chunk 1 opens ``[``, chunks 2..n lead with ``,``,
  last closes ``]``, `src/orc/json.clj:30-41`).

The stream shims are driver-side iterators (``toLocalIterator`` — bounded
memory, Spark's backpressure analog of the reference's ``buf-size`` channel);
they exist for API parity, not for cluster-scale dataflow — at scale you stay
in DataFrames.
"""

from __future__ import annotations

import json as _json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def configure(conf: dict[str, object]) -> tuple[dict[str, str], dict[str, str]]:
    """Map reference-style config entries to Hadoop conf; returns
    (settings, loggable) where loggable obfuscates private values."""
    settings: dict[str, str] = {}
    loggable: dict[str, str] = {}
    for key, spec in conf.items():
        if isinstance(spec, dict):
            value = str(spec.get("value"))
            private = bool(spec.get("private"))
        else:
            value, private = str(spec), False
        settings[key] = value
        loggable[key] = "*****" if private else value
    return settings, loggable


def apply_hadoop_conf(spark: SparkSession, settings: dict[str, str]) -> None:
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in settings.items():
        hconf.set(k, v)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    conf: dict[str, object] | None = None,
) -> DataFrame:
    if conf:
        settings, _ = configure(conf)
        apply_hadoop_conf(spark, settings)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.orc(path)
    if schema is not None:
        declared = spark.createDataFrame([], schema).schema
        actual = spark.read.orc(path).schema
        actual_types = {f.name: f.dataType for f in actual.fields}
        for field in declared.fields:
            if field.name not in actual_types:
                raise ValueError(
                    f"declared column {field.name!r} not in ORC file schema "
                    f"{actual.names} (the reference silently mis-decodes here)"
                )
            if actual_types[field.name] != field.dataType:
                # names alone don't prevent the reference's silent
                # mis-decode class — a type mismatch must throw at plan time
                raise ValueError(
                    f"declared column {field.name!r} is "
                    f"{field.dataType.simpleString()} but the ORC file has "
                    f"{actual_types[field.name].simpleString()}"
                )
    return df


def _rows(batch_df, coll_type: str):
    if coll_type == "map":
        # ordinal-keyed maps — the reference's memory-lean record shape
        # (`src/orc/core.clj:34-43`, README.md:49-50)
        return [dict(enumerate(r)) for r in batch_df]
    if coll_type == "vector":
        return [list(r) for r in batch_df]
    raise ValueError(f"Unsupported collection type: {coll_type}")  # core.clj:84


def read_stream(
    spark: SparkSession,
    path: str,
    coll_type: str = "map",
    bat_size: int = 1024,
    meta=None,
    fmt: str = "orc",
) -> Iterator:
    """Reference stream protocol: metadata, header, {"i", "rows"} chunks.

    Matches the element sequence asserted by `test/orc/read_test.clj:34-39`.

    PARITY API, not for bulk data: rows funnel through the driver
    (``toLocalIterator``) because the reference is a single-JVM channel
    consumer by design — the engine's distributed path is pipeline.decode.
    """
    df = getattr(spark.read, fmt)(path)
    yield meta(df.schema) if meta else "Read Stream"  # read.clj:22-25,89
    names = df.schema.names
    yield dict(enumerate(names)) if coll_type == "map" else list(names)  # :93
    buf, i = [], 1
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) >= bat_size:
            yield {"i": i, "rows": _rows(buf, coll_type)}
            buf, i = [], i + 1
    if buf or i == 1:
        # empty source still emits {:i 1 :rows []} (read_test.clj test-4)
        yield {"i": i, "rows": _rows(buf, coll_type)}


def _jsonify(rows) -> str:
    """J1 `jsonify` (`src/orc/json.clj:19-23`): JSON array minus brackets."""
    s = _json.dumps(rows, separators=(",", ":"))
    return s[1:-1]


def json_stream(
    spark: SparkSession,
    path: str,
    byte_limit: int,
    coll_type: str = "vector",
    bat_size: int = 1024,
    meta=None,
    fmt: str = "orc",
) -> Iterator:
    """Reference JSON chunk protocol with the exact reassembly grammar
    (`src/orc/json.clj:30-41,87-94`; asserted by `test/orc/json_test.clj:36-40`).

    PARITY API, not for bulk data: rows funnel through the driver
    (``toLocalIterator``), mirroring the reference's single-JVM byte-governed
    stream — the engine's distributed analog is the encode chunk governor.
    """
    df = getattr(spark.read, fmt)(path)
    yield meta(df.schema) if meta else "JSON Stream"  # json.clj:13-17,73
    names = df.schema.names
    header = dict(enumerate(names)) if coll_type == "map" else list(names)

    def prep(i: int, parts: list[str], suffix: str = "") -> str:
        # chunk 1 bare, chunks 2..n lead with ',' (json.clj:30-41);
        # empty acc yields just the suffix
        if not parts:
            return suffix
        body = ",".join(parts)
        return (body if i == 1 else "," + body) + suffix

    def bc(s: str) -> int:
        return len(s.encode("utf-8"))  # byte-count, json.clj:25-28

    # header chunk "[<header-json>" seeds the accumulator and its byte budget
    # (json.clj:75,80-81); empty-string batch chunks are dropped (:81, prep :32)
    hdr_chunk = "[" + _json.dumps(header, separators=(",", ":"))
    acc: list[str] = [hdr_chunk]
    acc_bytes = bc(hdr_chunk)
    i = 1
    buf = []

    def batches():
        nonlocal buf
        for row in df.toLocalIterator(prefetchPartitions=True):
            buf.append(row)
            if len(buf) >= bat_size:
                out, buf = buf, []
                yield out
        if buf:
            out, buf = buf, []
            yield out

    first = True
    for batch in batches():
        s = _jsonify(_rows(batch, coll_type))
        if s == "":
            continue
        acc_bytes += bc(s)
        acc.append(s)
        if first:
            # batch 1 is seeded before the reference's budget loop
            # (json.clj:75-81) — never flushed on its own
            first = False
            continue
        if acc_bytes >= byte_limit:  # flush includes current batch (json.clj:87-91)
            yield {"i": i, "chunk": prep(i, acc)}
            acc, acc_bytes, i = [], 0, i + 1
    yield {"i": i, "chunk": prep(i, acc, "]")}  # final ']' flush (json.clj:94)

"""Round-trip verification: decoded output ≡ source, bit-identical, at ≤ ORC size.

The engine-scale version of the reference's golden round-trip assertions
(`test/orc/read_test.clj:33-39`: write known columns, read back, assert exact
per-row equality).  Per BASELINE.json input_hint the per-row invariant is
**token-array equality**; NaN→nil normalization (`src/orc/col.clj:73-74`) is
deliberately NOT replicated — bit identity wins over reference quirks.

One full-outer join on ``doc_id`` yields every violation class in a single
shuffle: missing rows, extra rows, and per-column mismatches (array equality
on ``tokens`` is a native Spark comparison — stays in codegen, no Python).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def verify_digest(source: DataFrame, decoded: DataFrame) -> dict:
    """Shuffle-free bit-identity evidence: per-row xxhash64 over all columns,
    folded into an order-insensitive set digest (count, bit_xor, decimal sum).

    At 100 TB the exact full-outer join moves every token through a shuffle
    twice; this does two scans and a scalar agg instead.  Collision odds are
    ~2^-64 per row — paired with :func:`verify_roundtrip` in tests, this is
    the scale path.
    """

    def digest(df: DataFrame):
        h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
        return df.select(h.alias("h")).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("bit_xor(h)").alias("hxor"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum"),
        ).collect()[0]

    s, d = digest(source), digest(decoded)
    report = {
        "total": int(s["cnt"]),
        "decoded_total": int(d["cnt"]),
        "bit_identical": (
            s["cnt"] == d["cnt"] and s["hxor"] == d["hxor"] and s["hsum"] == d["hsum"]
        ),
        "method": "xxhash64-set-digest",
    }
    return report


def _row_hashes(tbl) -> "object":
    """Vectorized 64-bit canonical row hash over the four token-table
    columns — numpy only, so digesting runs at scan speed with no JVM row
    materialization of token arrays.  Field hashes (FNV-1a over bytes) are
    combined with a splitmix64-style mix; self-consistent between the
    source scan and the decode path, which is all a set digest needs."""
    import numpy as np

    from ..kernels import StringCol
    from ..operators.dedup import fnv1a_slices

    def str_hash(col) -> "np.ndarray":
        sc = StringCol.from_arrow(col.combine_chunks())
        return fnv1a_slices(
            np.frombuffer(sc.data, dtype=np.uint8),
            sc.offsets[:-1],
            np.diff(sc.offsets),
        )

    n_tok = np.asarray(tbl.column("n_tok").combine_chunks(), dtype=np.int64)
    toks = tbl.column("tokens").combine_chunks()
    flat = np.asarray(toks.flatten(), dtype=np.int32)
    offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    # token rows are KBs each — FNV's per-byte-position passes would cost
    # O(longest row) numpy sweeps.  Use a polynomial hash instead: each
    # uint32 token word is weighted by an odd 64-bit power of the position
    # WITHIN its row, then one add.reduceat folds every row in O(n) total.
    words = flat.view(np.uint32).astype(np.uint64)
    starts = offsets[:-1]
    maxlen = int(n_tok.max()) if len(n_tok) else 0
    with np.errstate(over="ignore"):
        powers = np.empty(max(1, maxlen), dtype=np.uint64)
        if maxlen:
            np.multiply.accumulate(
                np.full(maxlen, np.uint64(0xD1342543DE82EF95)), out=powers
            )
            powers *= np.uint64(0x9E3779B97F4A7C15)
        pos_in_row = np.arange(len(words), dtype=np.int64) - np.repeat(
            starts, n_tok
        )
        weighted = (words | np.uint64(1) << np.uint64(33)) * powers[pos_in_row]
        tok_h = np.zeros(len(n_tok), dtype=np.uint64)
        nonempty = n_tok > 0
        if nonempty.any():
            # reduceat quirk: equal consecutive indices return arr[i] instead
            # of 0, so fold only the non-empty rows
            tok_h[nonempty] = np.add.reduceat(weighted, starts[nonempty])
    h = np.uint64(0x9E3779B97F4A7C15) * np.ones(len(n_tok), dtype=np.uint64)
    for part in (
        str_hash(tbl.column("doc_id")),
        tok_h,
        n_tok.view(np.uint64),
        str_hash(tbl.column("source")),
    ):
        h = (h ^ part.astype(np.uint64)) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
    return h


_DIGEST_DDL = "cnt long, hxor long, slo long, shi long"


def _digest_rows(h) -> tuple:
    """(count, xor, sum-lo32, sum-hi32) — the per-task partial.  The 64-bit
    hash sum is tracked as two 32-bit column sums so a task of up to 2^32
    rows can never overflow an int64 accumulator."""
    import numpy as np

    if len(h) == 0:
        return (0, 0, 0, 0)
    xor = int(np.bitwise_xor.reduce(h))
    if xor >= 1 << 63:  # two's-complement into int64 range
        xor -= 1 << 64
    lo = int((h & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))
    hi = int((h >> np.uint64(32)).sum(dtype=np.uint64))
    return (int(len(h)), xor, lo, hi)


def _combine_digest(rows) -> dict:
    cnt, xor, total = 0, 0, 0
    for r in rows:
        cnt += r["cnt"]
        xor ^= r["hxor"]
        total += r["slo"] + (r["shi"] << 32)
    return {"cnt": cnt, "hxor": xor, "hsum": total % (1 << 128)}


def verify_digest_fast(spark, source_path: str, out_dir: str) -> dict:
    """Wire-speed bit-identity digest: pyarrow row-group scan of the source
    and chunk-file decode of the store, each hashed vectorized in numpy and
    reduced to ONE tiny row per task — neither side materializes token
    arrays as JVM rows (the cost that made :func:`verify_digest` the
    slowest step of the benchmark).  Falls back to :func:`verify_digest`
    when the source is not directly readable parquet."""
    import pyarrow as pa

    from .decode import _chunk_files, _manifest_files, decode, decode_chunk_table
    from .encode import (
        _local_parquet_files,
        _row_group_assignments,
        scan_work_df,
    )

    files = _local_parquet_files(source_path)
    if not files:
        return verify_digest(
            spark.read.parquet(source_path), decode(spark, out_dir)
        )

    def src_digest(batches):
        import json as _json

        import numpy as np
        import pyarrow.parquet as pq

        for batch in batches:
            for units_json in batch.column(1).to_pylist():
                parts = []
                for f, rg in _json.loads(units_json):
                    tbl = pq.ParquetFile(f).read_row_group(
                        int(rg), columns=["doc_id", "tokens", "n_tok", "source"]
                    )
                    parts.append(_digest_rows(_row_hashes(tbl)))
                cnt = sum(p[0] for p in parts)
                xor = 0
                for p in parts:
                    xor ^= p[1]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([cnt], pa.int64()),
                        pa.array([np.int64(xor)], pa.int64()),
                        pa.array([sum(p[2] for p in parts)], pa.int64()),
                        pa.array([sum(p[3] for p in parts)], pa.int64()),
                    ],
                    names=["cnt", "hxor", "slo", "shi"],
                )

    assignments = _row_group_assignments(
        files, spark.sparkContext.defaultParallelism * 2
    )
    src_rows = (
        scan_work_df(spark, assignments)
        .mapInArrow(src_digest, _DIGEST_DDL)
        .collect()
    )

    store_files = _manifest_files(spark, out_dir, None)
    if store_files is None:
        store_files = _chunk_files(os.path.join(out_dir, "chunks"), None)

    def store_digest(batches):
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for batch in batches:
            for path in batch.column(0).to_pylist():
                tbl = pq.read_table(path)
                ids = tbl.column("chunk_id").to_numpy()
                parts = []
                for cid in np.unique(ids):
                    group = tbl.filter(pc.equal(tbl.column("chunk_id"), cid))
                    parts.append(
                        _digest_rows(_row_hashes(decode_chunk_table(group)))
                    )
                cnt = sum(p[0] for p in parts)
                xor = 0
                for p in parts:
                    xor ^= p[1]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([cnt], pa.int64()),
                        pa.array([np.int64(xor)], pa.int64()),
                        pa.array([sum(p[2] for p in parts)], pa.int64()),
                        pa.array([sum(p[3] for p in parts)], pa.int64()),
                    ],
                    names=["cnt", "hxor", "slo", "shi"],
                )

    work = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(f,) for f in store_files], max(1, len(store_files))
        ),
        "path string",
    )
    dec_rows = work.mapInArrow(store_digest, _DIGEST_DDL).collect()

    s, d = _combine_digest(src_rows), _combine_digest(dec_rows)
    return {
        "total": s["cnt"],
        "decoded_total": d["cnt"],
        "bit_identical": s == d,
        "method": "fnv1a-mix-set-digest (arrow-native)",
    }


def verify_roundtrip(source: DataFrame, decoded: DataFrame) -> dict:
    s = source.select(
        F.col("doc_id").alias("s_doc_id"),
        F.col("tokens").alias("s_tokens"),
        F.col("n_tok").alias("s_n_tok"),
        F.col("source").alias("s_source"),
    )
    d = decoded.select(
        F.col("doc_id").alias("d_doc_id"),
        F.col("tokens").alias("d_tokens"),
        F.col("n_tok").alias("d_n_tok"),
        F.col("source").alias("d_source"),
    )
    joined = s.join(d, F.col("s_doc_id") == F.col("d_doc_id"), "full_outer")
    agg = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("d_doc_id").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(F.col("s_doc_id").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(
            F.when(
                F.col("s_doc_id").isNotNull()
                & F.col("d_doc_id").isNotNull()
                & ~(F.col("s_tokens") == F.col("d_tokens")),
                1,
            ).otherwise(0)
        ).alias("tokens_mismatch"),
        F.sum(
            F.when(
                F.col("s_doc_id").isNotNull()
                & F.col("d_doc_id").isNotNull()
                & (
                    (F.col("s_n_tok") != F.col("d_n_tok"))
                    | (F.col("s_source") != F.col("d_source"))
                ),
                1,
            ).otherwise(0)
        ).alias("scalar_mismatch"),
    ).collect()[0]
    report = {k: int(agg[k] or 0) for k in
              ("total", "missing", "extra", "tokens_mismatch", "scalar_mismatch")}
    report["bit_identical"] = (
        report["missing"] == 0
        and report["extra"] == 0
        and report["tokens_mismatch"] == 0
        and report["scalar_mismatch"] == 0
    )
    return report


def encoded_size_bytes(spark, out_dir: str) -> dict:
    """Engine output accounting: payload bytes + manifest (meta) bytes."""
    manifest = spark.read.parquet(os.path.join(out_dir, "manifest", "chunks"))
    payload = manifest.agg(F.sum("enc_bytes")).collect()[0][0] or 0
    meta_bytes = 0
    for sub in ("manifest",):
        for root, _, files in os.walk(os.path.join(out_dir, sub)):
            meta_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return {
        "payload_bytes": int(payload),
        "manifest_bytes": int(meta_bytes),
        "total_bytes": int(payload) + int(meta_bytes),
    }


def size_gate(spark, out_dir: str, reference_orc_bytes: int) -> dict:
    sizes = encoded_size_bytes(spark, out_dir)
    sizes["reference_orc_bytes"] = int(reference_orc_bytes)
    sizes["ratio"] = sizes["total_bytes"] / max(1, reference_orc_bytes)
    sizes["under_bar"] = sizes["total_bytes"] <= reference_orc_bytes
    return sizes

"""Resume-from-checkpoint: completed partitions are never re-encoded
(SURVEY.md §5 engine-test 5; north_rule "resumable from checkpoint with
per-partition lineage")."""

import os

from clj_orc_spark.pipeline import decode, encode, verify_roundtrip


def _part_file_mtimes(chunks_dir):
    out = {}
    for root, _, files in os.walk(chunks_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


def test_resume_skips_completed_partitions(spark, token_table_dir, tmp_dir):
    src = os.path.join(token_table_dir, "tokens.parquet")
    out = os.path.join(tmp_dir, "enc")

    # simulate a killed run: encode only 2 of 4 partitions
    r1 = encode(spark, src, out, n_partitions=4, limit_parts=2)
    assert r1["pending"] == 2

    mtimes_after_wave1 = _part_file_mtimes(os.path.join(out, "chunks"))
    assert mtimes_after_wave1, "wave 1 wrote chunk files"

    # rerun to completion: only the remaining partitions are encoded
    r2 = encode(spark, src, out, n_partitions=4)
    assert r2["skipped"] == 2 and r2["pending"] >= 1

    mtimes_after_wave2 = _part_file_mtimes(os.path.join(out, "chunks"))
    for path, mtime in mtimes_after_wave1.items():
        assert mtimes_after_wave2[path] == mtime, f"re-encoded completed file {path}"

    # final output identical to source
    source = spark.read.parquet(src)
    v = verify_roundtrip(source, decode(spark, out))
    assert v["bit_identical"] and v["total"] == 5_000, v

    # idempotent third run: nothing pending
    r3 = encode(spark, src, out, n_partitions=4)
    assert r3["pending"] == 0


def test_resume_survives_static_overwrite_session(spark, token_table_dir, tmp_dir):
    """Regression: a caller-owned session with partitionOverwriteMode=static
    must NOT wipe completed partitions on resume (the writer-level option
    pins dynamic overwrite; found by driving a plain SparkSession)."""
    src = os.path.join(token_table_dir, "tokens.parquet")
    out = os.path.join(tmp_dir, "enc")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        encode(spark, src, out, n_partitions=4, limit_parts=2)
        encode(spark, src, out, n_partitions=4)
        v = verify_roundtrip(spark.read.parquet(src), decode(spark, out))
        assert v["bit_identical"] and v["total"] == 5_000, v
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_orphaned_wave_is_overwritten_not_duplicated(spark, token_table_dir, tmp_dir):
    """Crash between chunk write and manifest append → rerun must not
    duplicate rows (dynamic partition overwrite makes the wave idempotent)."""
    import shutil

    src = os.path.join(token_table_dir, "tokens.parquet")
    out = os.path.join(tmp_dir, "enc")
    encode(spark, src, out, n_partitions=4, limit_parts=2)
    # simulate the crash: chunks written for wave-1 parts but manifest lost
    shutil.rmtree(os.path.join(out, "manifest"))
    encode(spark, src, out, n_partitions=4)
    source = spark.read.parquet(src)
    v = verify_roundtrip(source, decode(spark, out))
    assert v["bit_identical"] and v["extra"] == 0, v

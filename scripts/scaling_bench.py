"""Multi-level scaling benchmark → BENCH.md.

The north rule requires ≥0.8 throughput scaling efficiency between N and 4N
executors, evidenced in this sandbox by running the same encode job at
several local[] parallelism levels on the same input (driver instruction).
Levels are interleaved across reps (neighbor noise hits all levels equally),
a warmup run precedes measurement, and the median per level is reported.
Both N→4N pairs (2→8 and 8→32) are derived from the same level medians.

Usage: python scripts/scaling_bench.py [--rows 4000000] [--reps 3]
       [--levels 2,8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_encode(cores: int, src_path: str, rep: int) -> dict:
    from clj_orc_spark.pipeline import decode, encode, verify_digest
    from clj_orc_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", app_name=f"scaling-{cores}-{rep}")
    spark.sparkContext.setLogLevel("ERROR")
    # output on RAM-backed storage: on a real cluster write bandwidth scales
    # with node count; a single shared disk would serialize it here
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out = f"{base}/clj-orc-scaling-{cores}-{rep}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    encode(spark, src_path, out, resume=False)
    wall = time.time() - t0
    from pyspark.sql import functions as F

    manifest = spark.read.parquet(os.path.join(out, "manifest", "chunks"))
    raw_tok = (
        manifest.where(F.col("col") == "token_values").agg(F.sum("raw_bytes")).collect()[0][0]
    )
    raw_all = manifest.agg(F.sum("raw_bytes")).collect()[0][0]
    v = verify_digest(spark.read.parquet(src_path), decode(spark, out))
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return {
        "cores": cores,
        "rep": rep,
        "wall_sec": round(wall, 2),
        "tokens": int(raw_tok // 4),
        "tokens_per_sec": round(raw_tok / 4 / wall, 1),
        "gb_per_sec": round(raw_all / 1e9 / wall, 4),
        "bit_identical": v["bit_identical"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--levels", type=str, default="2,8,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    pairs = [(a, b) for a in levels for b in levels if b == 4 * a]
    assert pairs, "need at least one N/4N pair among the levels"

    # distributed generation (block-deterministic — same bytes as gen_table);
    # driver-side generation of 4M rows takes ~14 min, spark_gen ~1 min
    src = f"/tmp/clj-orc-spark-scaling-src-{args.rows}"
    if not os.path.isdir(src):
        from clj_orc_spark.datagen import spark_gen
        from clj_orc_spark.session import get_spark

        spark = get_spark(master="local[32]", app_name="scaling-datagen")
        spark.sparkContext.setLogLevel("ERROR")
        spark_gen(spark, args.rows, seed=42).write.parquet(src)
        spark.stop()

    # warmup (page cache + JVM/daemon startup), not recorded
    run_encode(max(levels), src, 99)

    runs = []
    for rep in range(args.reps):
        for cores in levels:
            r = run_encode(cores, src, rep)
            print(json.dumps(r), flush=True)
            runs.append(r)

    def median_run(cores: int) -> dict:
        rs = sorted((r for r in runs if r["cores"] == cores),
                    key=lambda r: r["tokens_per_sec"])
        return rs[len(rs) // 2]

    med = {c: median_run(c) for c in levels}
    effs = {
        f"{a}v{b}": round(
            med[b]["tokens_per_sec"] / ((b / a) * med[a]["tokens_per_sec"]), 3
        )
        for a, b in pairs
    }
    summary = {
        "rows": args.rows,
        "levels": levels,
        "medians": med,
        "scaling_efficiency": effs,
        "meets_0.8_bar": {k: v >= 0.8 for k, v in effs.items()},
    }
    print(json.dumps(summary))

    level_rows = os.linesep.join(
        f"| local[{c}] | {med[c]['wall_sec']} | {med[c]['tokens_per_sec']:,.0f} "
        f"| {med[c]['gb_per_sec']} |"
        for c in levels
    )
    eff_rows = os.linesep.join(
        f"| N={a} → 4N={b} | **{effs[f'{a}v{b}']:.3f}** "
        f"| {'meets' if effs[f'{a}v{b}'] >= 0.8 else 'BELOW'} the ≥0.8 bar |"
        for a, b in pairs
    )
    md = f"""# BENCH — measured engine performance

## Scaling efficiency (north_rule: ≥0.8 between N and 4N)

Same encode job (plan → fused pyarrow scan + salted repartition → mapInArrow
codec kernels → chunk+manifest write) on the same {args.rows:,}-row
deterministic token table ({med[levels[-1]]['tokens']:,} tokens), run at
{len(levels)} parallelism levels as the sandbox stand-in for executor-cluster
sizes (single machine, local mode; this shared sandbox shows heavy neighbor
noise — identical runs have varied up to 3x — so levels are interleaved, a
warmup run precedes measurement, and the MEDIAN of {args.reps} reps per level
is reported).  Single-box caveats that do not exist on a real 4N cluster: all
levels share one memory bus and one page cache, and the highest level shares
its 32 hardware threads with the JVM's own shuffle/GC threads while lower
levels have spare cores.

| parallelism | wall (s) | tokens/s | GB/s (raw) |
|---|---|---|---|
{level_rows}

| pair | efficiency = tokens/s(4N) / (4 × tokens/s(N)) | verdict |
|---|---|---|
{eff_rows}

Bit-identity verified (xxhash64 set digest) at every level:
{', '.join(f"local[{c}]={med[c]['bit_identical']}" for c in levels)}.

All runs:

```json
{os.linesep.join(json.dumps(r) for r in runs)}
```

## Headline numbers (see BENCH_r*.json for the per-round driver record)

- compression: 13.51 bits/token on zipf(1.1) tokens → **0.577× the reference
  ORC writer's output** (pyarrow.orc defaults, the bar from
  `test/orc/fixture.clj:25-27` semantics); ORC-default needs ~23.2 bits/token
  on the same column, parquet-default ~14.2; empirical entropy is 7.2 — the
  remaining gap requires entropy coding, excluded by the lightweight-only
  north rule.
- decoded output is bit-identical to source (token-array equality per row,
  exact full-outer-join check in tests, xxhash64 set-digest check at scale);
  every payload CRC-checked at decode.
- **fused pyarrow scan** (round 2): the encode job was parquet-scan-bound
  (~5.6 MB/s/core JVM nested scan); the first mapInArrow stage now reads row
  groups with pyarrow and assigns part_id in numpy.  Interleaved A/B in one
  local[32] session at sf0.1: fused 17.5/21.8 s vs JVM scan 40.8/30.9 s
  (~1.8×).
- kernel-level single-core: ~25 MB/s encode / ~72 MB/s decode on the token
  column (patched-FOR w=8 + exception bitmap); FSST ~2 MB/s on doc_id
  strings (3% of bytes).
- deployment: spark-submit --py-files (scripts/submit_encode.py) verified,
  including resume across separate submit invocations.
"""
    bench_md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md")
    with open(bench_md, "w") as f:
        f.write(md)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()

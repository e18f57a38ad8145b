"""Two-cluster-size scaling benchmark → BENCH.md.

The north rule requires ≥0.8 throughput scaling efficiency between N and 4N
executors, evidenced in this sandbox by running the same encode job at
local[8] (N) and local[32] (4N) on the same input (driver instruction).
Each level runs in its own SparkSession; multiple reps, best-of (this box
shows heavy wall-clock variance — see BENCH.md notes).

Usage: python scripts/scaling_bench.py [--rows 1000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CORES = 8   # overridable via --n
N4_CORES = 32  # overridable via --n4


def run_encode(cores: int, src_path: str, rep: int) -> dict:
    from clj_orc_spark.pipeline import encode, verify_digest, decode
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
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--n4", type=int, default=None)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    global N_CORES, N4_CORES
    if args.n: N_CORES = args.n
    if args.n4: N4_CORES = args.n4
    assert N4_CORES == 4 * N_CORES, "levels must be N and 4N"

    from clj_orc_spark.datagen import write_token_table

    table_dir = f"/tmp/clj-orc-spark-bench-{args.rows}"
    info = write_token_table(table_dir, args.rows, seed=42, with_orc_reference=False)
    src = info["parquet"]

    # warmup (page cache + JVM/daemon startup), not recorded
    run_encode(N4_CORES, src, 99)

    # interleave levels so environment drift (shared sandbox) hits both
    runs = []
    for rep in range(args.reps):
        for cores in (N_CORES, N4_CORES):
            r = run_encode(cores, src, rep)
            print(json.dumps(r), flush=True)
            runs.append(r)

    def median_run(cores: int) -> dict:
        rs = sorted((r for r in runs if r["cores"] == cores),
                    key=lambda r: r["tokens_per_sec"])
        return rs[len(rs) // 2]

    best = {c: median_run(c) for c in (N_CORES, N4_CORES)}
    eff = best[N4_CORES]["tokens_per_sec"] / (
        (N4_CORES / N_CORES) * best[N_CORES]["tokens_per_sec"]
    )
    summary = {
        "rows": args.rows,
        "n_cores": N_CORES,
        "n4_cores": N4_CORES,
        "best_n": best[N_CORES],
        "best_4n": best[N4_CORES],
        "scaling_efficiency": round(eff, 3),
        "meets_0.8_bar": eff >= 0.8,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — measured engine performance

## Scaling efficiency (north_rule: ≥0.8 between N and 4N)

Same encode job (plan → salted repartition → mapInArrow encode → chunk+manifest
write) on the same {args.rows:,}-row deterministic token table
({best[N4_CORES]['tokens']:,} tokens), run at two parallelism levels as the
sandbox stand-in for N vs 4N executor clusters (single machine, local mode;
this shared sandbox shows heavy neighbor noise — identical runs have varied
up to 3x — so levels are interleaved, a warmup run precedes measurement, and
the MEDIAN of {args.reps} reps per level is reported).  Single-box caveats
that do not exist on a real 4N cluster: all levels share one memory bus and
one page cache, and the 4N level shares its 32 hardware threads with the
JVM's own shuffle/GC threads while the N level has 24 spare.

| cluster size | wall (s) | tokens/s | GB/s (raw) |
|---|---|---|---|
| N = local[{N_CORES}] | {best[N_CORES]['wall_sec']} | {best[N_CORES]['tokens_per_sec']:,.0f} | {best[N_CORES]['gb_per_sec']} |
| 4N = local[{N4_CORES}] | {best[N4_CORES]['wall_sec']} | {best[N4_CORES]['tokens_per_sec']:,.0f} | {best[N4_CORES]['gb_per_sec']} |

**Scaling efficiency = tokens/s(4N) / (4 × tokens/s(N)) = {eff:.3f}**
({'meets' if eff >= 0.8 else 'BELOW'} the ≥0.8 bar).

Bit-identity verified (xxhash64 set digest) at both levels:
N={best[N_CORES]['bit_identical']}, 4N={best[N4_CORES]['bit_identical']}.

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
- bench.py @ sf0.1 (500k rows / 330M tokens, local[32]): encode ~18s wall
  (15–18M tokens/s; the job is parquet-scan-bound — kernels, shuffle and
  write fully overlap the scan), files-mode decode ~3.6s, digest verify ~4.4s.
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

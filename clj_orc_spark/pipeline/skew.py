"""Skew-aware partition planning: n_tok quantile buckets + salting.

AQE's skew handling only rebalances *shuffle joins*; it cannot fix map-side
skew from long token arrays concentrating in a few tasks (SURVEY.md §4.3).
So the engine plans explicitly (north_rule: "partitioning / shuffle / skew
handled explicitly"):

1. ``approxQuantile("n_tok")`` → quantile bucket boundaries (driver-side,
   sampled — one cheap pass);
2. a tiny rollup agg measures each bucket's *token share* (not row share —
   work is proportional to tokens, not rows);
3. each bucket gets a partition-count allocation proportional to its token
   share, and rows are salted across the bucket's partitions by
   ``xxhash64(doc_id)`` — deterministic across runs, which is what makes
   per-partition lineage / resume possible.

``part_id`` is therefore a *content-derived, stable* partition identity:
the resume unit recorded in the manifest.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import DataFrame, functions as F

DEFAULT_N_BUCKETS = 8
PLAN_SAMPLE_ROWS = 400_000


def compute_plan(
    df: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    length_col: str = "n_tok",
    total_rows: int | None = None,
    seed: int = 42,
) -> dict:
    """One sampled pass → JSON-able partition plan (bounds, offsets, allocs).

    The plan is persisted alongside the manifest (encode.py) so resumed runs
    reuse the exact same part_id assignment — plan determinism is what makes
    per-partition lineage sound.  At 10^12 rows a full quantile pass would be
    its own job; a seeded sample of ~400k lengths (a few MB on the driver) is
    statistically plenty for 8 quantile buckets.
    """
    n_partitions = max(1, n_partitions)
    lengths_df = df.select(length_col)
    if total_rows is None:
        # caller gave a bare DataFrame (no parquet footers to read): one
        # cheap column-pruned count keeps the sample fraction honest — the
        # collect below must NEVER be unbounded (10^12-row driver OOM)
        total_rows = lengths_df.count()
    if total_rows > PLAN_SAMPLE_ROWS:
        lengths_df = lengths_df.sample(
            fraction=min(1.0, PLAN_SAMPLE_ROWS * 1.25 / total_rows), seed=seed
        )
    lengths = np.array([r[0] for r in lengths_df.collect()], dtype=np.float64)
    if len(lengths) == 0:
        return {"bounds": [], "offsets": [0], "allocs": [1], "n_total": 1,
                "sample_n": 0}

    probs = [100.0 * i / n_buckets for i in range(1, n_buckets)]
    bounds = list(np.percentile(lengths, probs))
    uniq_bounds: list[float] = []
    for b in bounds:
        if not uniq_bounds or b > uniq_bounds[-1]:
            uniq_bounds.append(float(b))

    # token share per bucket from the same sample
    which = np.searchsorted(np.array(uniq_bounds), lengths, side="left")
    n_b = len(uniq_bounds) + 1
    shares = np.zeros(n_b)
    for b in range(n_b):
        shares[b] = lengths[which == b].sum()
    total = shares.sum() or 1.0

    allocs, offsets, cum = [], [], 0
    for b in range(n_b):
        k = max(1, round(n_partitions * shares[b] / total)) if shares[b] > 0 else 1
        offsets.append(cum)
        allocs.append(k)
        cum += k
    return {
        "bounds": uniq_bounds,
        "offsets": offsets,
        "allocs": allocs,
        "n_total": cum,
        # lineage: how many lengths the plan was derived from (bounded by
        # ~1.25 × PLAN_SAMPLE_ROWS regardless of input size)
        "sample_n": int(len(lengths)),
    }


def apply_plan(
    df: DataFrame,
    plan: dict,
    length_col: str = "n_tok",
    key_col: str = "doc_id",
) -> DataFrame:
    """Attach the deterministic ``part_id`` column from a computed plan."""
    bounds = plan["bounds"]
    bucket_expr = reduce(
        lambda acc, ib: acc.when(F.col(length_col) <= F.lit(ib[1]), F.lit(ib[0])),
        enumerate(bounds),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(len(bounds)))
    offset_expr = reduce(
        lambda acc, b: acc.when(F.col("_bucket") == b, F.lit(plan["offsets"][b])),
        range(len(plan["allocs"])),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0))
    nparts_expr = reduce(
        lambda acc, b: acc.when(F.col("_bucket") == b, F.lit(plan["allocs"][b])),
        range(len(plan["allocs"])),
        F.when(F.lit(False), F.lit(1)),
    ).otherwise(F.lit(1))
    return (
        df.withColumn("_bucket", bucket_expr.cast("int"))
        .withColumn(
            "part_id",
            (offset_expr + F.pmod(F.xxhash64(F.col(key_col)), nparts_expr)).cast("int"),
        )
        .drop("_bucket")
    )


def plan_partitions(
    df: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    length_col: str = "n_tok",
    key_col: str = "doc_id",
    total_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """compute_plan + apply_plan in one call (tests / ad-hoc use)."""
    plan = compute_plan(df, n_partitions, n_buckets, length_col, total_rows)
    return apply_plan(df, plan, length_col, key_col), plan["n_total"]


def partition_balance_report(df: DataFrame, length_col: str = "n_tok") -> dict:
    """Max/median tokens per part_id — the skew test's assertion target."""
    per_part = df.groupBy("part_id").agg(F.sum(length_col).alias("toks"))
    rows = [r["toks"] for r in per_part.collect()]
    rows.sort()
    if not rows:
        return {"parts": 0, "max": 0, "median": 0, "skew_ratio": 0.0}
    median = rows[len(rows) // 2]
    return {
        "parts": len(rows),
        "max": int(rows[-1]),
        "median": int(median),
        "skew_ratio": float(rows[-1] / max(1, median)),
    }

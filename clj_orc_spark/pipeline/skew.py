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

from pyspark.sql import DataFrame, functions as F

DEFAULT_N_BUCKETS = 8


def plan_partitions(
    df: DataFrame,
    n_partitions: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    length_col: str = "n_tok",
    key_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Add a deterministic ``part_id`` column balancing total tokens/partition."""
    n_partitions = max(1, n_partitions)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(length_col, probs, 0.01)
    # dedupe boundaries (degenerate distributions)
    uniq_bounds: list[float] = []
    for b in bounds:
        if not uniq_bounds or b > uniq_bounds[-1]:
            uniq_bounds.append(b)

    bucket_expr = reduce(
        lambda acc, ib: acc.when(F.col(length_col) <= F.lit(ib[1]), F.lit(ib[0])),
        enumerate(uniq_bounds),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(len(uniq_bounds)))
    with_bucket = df.withColumn("_bucket", bucket_expr.cast("int"))

    shares = (
        with_bucket.groupBy("_bucket").agg(F.sum(length_col).alias("_toks")).collect()
    )
    total_toks = sum(r["_toks"] for r in shares) or 1
    # allocate ≥1 partition per non-empty bucket, proportional to token share
    alloc: dict[int, int] = {}
    for r in sorted(shares, key=lambda r: r["_bucket"]):
        alloc[r["_bucket"]] = max(1, round(n_partitions * r["_toks"] / total_toks))
    offsets: dict[int, int] = {}
    cum = 0
    for b in sorted(alloc):
        offsets[b] = cum
        cum += alloc[b]

    offset_expr = reduce(
        lambda acc, b: acc.when(F.col("_bucket") == b, F.lit(offsets[b])),
        sorted(alloc),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0))
    nparts_expr = reduce(
        lambda acc, b: acc.when(F.col("_bucket") == b, F.lit(alloc[b])),
        sorted(alloc),
        F.when(F.lit(False), F.lit(1)),
    ).otherwise(F.lit(1))

    return (
        with_bucket.withColumn(
            "part_id",
            (offset_expr + F.pmod(F.xxhash64(F.col(key_col)), nparts_expr)).cast("int"),
        )
        .drop("_bucket")
    ), cum


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

"""Skew handling: n_tok-quantile buckets + salting balance tokens/partition
(SURVEY.md §7 step 7; north_rule "no executor receives pathological
long-sequence hot partitions")."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clj_orc_spark.pipeline.skew import partition_balance_report, plan_partitions


def _skewed_table(tmp_dir: str) -> str:
    """90% tiny docs, 10% pathological 8k-token docs — the hot-key shape."""
    rng = np.random.default_rng(11)
    n = 20_000
    n_tok = np.where(rng.random(n) < 0.9,
                     rng.integers(1, 50, n),
                     rng.integers(7000, 8193, n)).astype(np.int32)
    tbl = pa.table({
        "doc_id": pa.array([f"d-{i:08d}" for i in range(n)]),
        "n_tok": pa.array(n_tok, type=pa.int32()),
    })
    path = f"{tmp_dir}/skewed.parquet"
    pq.write_table(tbl, path)
    return path


def test_partition_plan_balances_tokens(spark, tmp_dir):
    df = spark.read.parquet(_skewed_table(tmp_dir))
    planned, n_total = plan_partitions(df, 8)
    assert n_total >= 8
    report = partition_balance_report(planned)
    assert report["parts"] == n_total
    # balanced: the hottest partition carries < 2x the median token load
    assert report["skew_ratio"] < 2.0, report


def test_part_id_deterministic_across_runs(spark, tmp_dir):
    path = _skewed_table(tmp_dir)
    df = spark.read.parquet(path)
    a, _ = plan_partitions(df, 8)
    b, _ = plan_partitions(spark.read.parquet(path), 8)
    diff = (
        a.select("doc_id", "part_id")
        .exceptAll(b.select("doc_id", "part_id"))
        .count()
    )
    assert diff == 0

"""Soundness of the two probabilistic-operator oracles (round 3).

`minhash_verified` and `embed_near_dup_lsh` are LSH candidate stages with
EXACT verify stages.  Their DuckDB oracles are brute-force all-pairs
computations — sound iff candidate recall is 1.0 at the oracle's data scale.
Seeds are fixed, so recall is a deterministic property of (params, data):
these tests assert it directly against the exact baselines, making the
oracles sound by construction rather than by hope."""

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason=f"testdata {SF} not present"
)


def test_embed_lsh_recall_is_exact_at_oracle_scale(spark):
    """cosine_near_dups_lsh with the oracle's recall-1.0 banding (r=1,
    16 bands) must return EXACTLY the O(n²) exact baseline's pairs —
    same ids, same cos_sim values."""
    from clj_orc_spark.operators import cosine_near_dups, cosine_near_dups_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dups(emb, threshold=0.38).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dups_lsh(
            emb, threshold=0.38, n_planes=16, bands=16, max_bucket=600
        ).collect()
    }
    assert len(exact) > 0  # the data actually exercises the threshold
    assert lsh == exact


def test_embed_near_dup_driver_config_recall_is_exact(spark):
    """The `embed_near_dup` driver query (round 5: bounded vec_id<500
    slice, threshold 0.35, fixed 600 cap — no count() action, no
    O(n²)-equivalent bucket expansion) must equal the exact baseline on
    the same slice."""
    from pyspark.sql import functions as F

    from clj_orc_spark.operators import cosine_near_dups, cosine_near_dups_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where(
        F.col("vec_id") < 500
    )
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dups(emb, threshold=0.35).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dups_lsh(
            emb, threshold=0.35, n_planes=16, bands=16, max_bucket=600
        ).collect()
    }
    assert len(exact) > 0
    assert lsh == exact


def test_minhash_verified_equals_bruteforce_at_oracle_scale(spark):
    """The full candidate→verify pipeline must equal DuckDB's brute-force
    all-pairs exact 3-gram Jaccard — i.e. the MinHash candidate stage
    missed nothing at this scale."""
    import duckdb

    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["minhash_verified"](spark, SF).collect()
    spark_pairs = sorted((r.id_a, r.id_b, float(r.jaccard)) for r in rows)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    duck_pairs = sorted(
        (r[0], r[1], float(r[2]))
        for r in con.sql(entry_mod.oracle_sql()["minhash_verified"]).fetchall()
    )
    assert len(spark_pairs) > 0
    assert spark_pairs == duck_pairs

"""Operator tests: dedup (exact/minhash/simhash/jaccard), similarity
(brute-force/IVF/LSH), text stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clj_orc_spark.operators import (
    brute_force_topk,
    exact_dedup,
    fingerprint,
    ivf_topk,
    language_id,
    lsh_bucket_topk,
    minhash_lsh,
    ngram_jaccard_pairs,
    quality_score,
    simhash_candidates,
    token_count,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to find some tasty food for dinner"
    )
    rows = []
    for i in range(40):
        rows.append((f"a-{i:03d}", base))                     # exact dups
        rows.append((f"b-{i:03d}", base.replace("lazy", f"lazy{i}")))  # near dups
        # genuinely distinct content: seeded random word soup
        rng = np.random.default_rng(i)
        soup = " ".join(
            "".join(chr(97 + c) for c in rng.integers(0, 26, 8))
            for _ in range(24)
        )
        rows.append((f"c-{i:03d}", soup))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_dedup(dup_docs):
    d = exact_dedup(dup_docs).where(F.col("n_copies") > 1).collect()
    assert len(d) == 1 and d[0]["n_copies"] == 40
    assert d[0]["keep_id"] == "a-000"


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = minhash_lsh(dup_docs, threshold=0.5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # near-dup family (a-* and b-*) must pair up, unrelated (c-*) must not
    assert any(a.startswith("a-") and b.startswith("b-") for a, b in ids) or any(
        a.startswith("a-") and b.startswith("a-") for a, b in ids
    )
    assert not any(a.startswith("c-") and b.startswith("c-") for a, b in ids)


def test_minhash_estimates_match_true_jaccard(dup_docs):
    pairs = minhash_lsh(dup_docs, threshold=0.4)
    verified = ngram_jaccard_pairs(dup_docs, pairs, n=3).collect()
    assert verified, "verification stage returned pairs"
    for r in verified:
        assert r["jaccard"] > 0.3, r  # LSH candidates are genuinely similar


def test_simhash_candidates(dup_docs):
    # max_bucket must exceed the 40-strong exact-dup family or its buckets
    # are (correctly) capped away.  Radius 2: at hamming 4/64 a short
    # word-soup doc can legitimately collide with the family (observed) —
    # simhash false positives are inherent at wide radii, the verify stage
    # (ngram_jaccard_pairs) exists to remove them.
    pairs = simhash_candidates(dup_docs, max_hamming=2, max_bucket=200).collect()
    assert pairs
    for r in pairs:
        assert r["hamming"] <= 2
        fam = (r["id_a"][0], r["id_b"][0])
        assert "c" not in fam, f"unrelated doc paired: {r}"


def test_brute_force_topk_self_similarity(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 5).first()["embedding"]
    top = brute_force_topk(emb, list(q), k=3).collect()
    assert top[0]["vec_id"] == 5 and abs(top[0]["cos_sim"] - 1.0) < 1e-6


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 7).first()["embedding"])
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, q, k=10, n_centroids=8, n_probe=4).collect()]
    # probing half the centroids must recover most of the true top-10
    assert len(set(exact) & set(approx)) >= 5, (exact, approx)


def test_cosine_near_dups_lsh_recall(spark):
    """On clustered vectors (true near-dups), the LSH-bucketed path must
    recover ≥90% of the exact pairs — and never invent one (exact cosine
    verify runs inside the buckets, so precision is 1.0 by construction)."""
    import numpy as np

    from clj_orc_spark.operators import cosine_near_dups, cosine_near_dups_lsh

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, (v / np.linalg.norm(v)).tolist()))
        n = v + rng.standard_normal(32) * 0.05  # a true near-duplicate
        rows.append((i * 2 + 1, (n / np.linalg.norm(n)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r["id_a"], r["id_b"])
             for r in cosine_near_dups(df, threshold=0.95).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in cosine_near_dups_lsh(df, threshold=0.95, n_planes=16,
                                         bands=8).collect()}
    assert exact, "fixture must contain true near-dups"
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9


def test_lsh_bucket_topk_returns_query_bucket(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 3).first()["embedding"])
    res = lsh_bucket_topk(emb, q, k=5, n_planes=4).collect()
    assert res and res[0]["vec_id"] == 3  # query's own vector shares its bucket


def test_language_id(spark):
    rows = [
        ("e1", "the cat and the dog went to the park and it was fun for all"),
        ("d1", "der hund und die katze sind nicht mit der maus zu hause ein tag"),
        ("f1", "le chat et le chien sont dans la maison pour une belle journée"),
        ("s1", "el perro y el gato están en la casa y es un buen día para todos"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out == {"e1": "en", "d1": "de", "f1": "fr", "s1": "es"}


def test_token_count_models(spark):
    df = spark.createDataFrame([("x", "Hello, world! 42 times.")], "id string, text string")
    ws = df.select(token_count(F.col("text"), "whitespace").alias("n")).first()["n"]
    bpe = df.select(token_count(F.col("text"), "bpe_regex").alias("n")).first()["n"]
    assert ws == 4
    assert bpe == 7  # Hello , world ! 42 times .


def test_quality_score_orders_garbage_below_prose(spark):
    rows = [
        ("good", "this is a perfectly normal sentence with reasonable words in it"),
        ("bad", "@@@@!!!! ###### 123456789 !!%%%% ^^&&** 00000 11111 @@@@@"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert got["good"] > got["bad"]


def test_fingerprint_normalization(spark):
    rows = [("a", "Hello   World"), ("b", "hello world"), ("c", "different")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: (r["fp_exact"], r["fp_norm"]) for r in fingerprint(df).collect()}
    assert out["a"][0] != out["b"][0]          # exact differs
    assert out["a"][1] == out["b"][1]          # normalized matches
    assert out["c"][1] != out["a"][1]


def test_multimodal_plumbing(spark):
    from clj_orc_spark.operators.multimodal import (
        extract_features,
        fake_media_table,
        media_partition_plan,
    )

    media = fake_media_table(spark, 48)
    feats = extract_features(media).collect()
    assert len(feats) == 48
    assert all(len(r["feature"]) == 64 for r in feats)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in feats}
    assert first == again
    planned = media_partition_plan(media)
    assert "size_bucket" in planned.columns

    # strict stubs fail loudly
    from clj_orc_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", {})

"""Round-4 review fixes: plan-resume mode mismatch, IVF sampling fallback,
chao1 cardinality extrapolation, and the driver-collect scale guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import DataFrame

from clj_orc_spark.pipeline import decode, encode
from clj_orc_spark.selector import INT_SAMPLE, int_stats


def _tiny_df(spark, n=40):
    rows = [(f"d{i:04d}", [i % 7, i % 11, 3], 3, f"src{i % 3}") for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_plan_resume_mode_mismatch_raises(spark, tmp_path):
    """encode(plan=...) against a store persisted in salted/JVM mode must
    raise a clear error naming the persisted mode, not crash in
    spark.read.parquet(None) (round-3 advice)."""
    out = str(tmp_path / "store")
    encode(spark, df=_tiny_df(spark), out_dir=out, n_partitions=2)
    fake_plan = {"mode": "rowgroup", "n_total": 1, "parts": [[]]}
    with pytest.raises(ValueError, match="persisted .*-mode plan"):
        encode(spark, out_dir=out, plan=fake_plan)


#: the only driver-collect shapes encode() may produce: the resume marker
#: part_id list, and the per-part rollup (one row per partition, five
#: numeric columns) that _commit_manifest writes locally — both bounded by
#: the PARTITION count, never chunk rows
_ALLOWED_COLLECTS = {
    ("part_id",),
    ("part_id", "n_chunks", "n_rows", "enc_bytes", "raw_bytes"),
}


def test_commit_manifest_collects_only_part_ids(spark, tmp_path, monkeypatch):
    """SCALE GUARD: every driver-side collect inside encode() must be
    bounded by the PARTITION count (the part_id resume list or the per-part
    rollup) — a future edit widening it to chunk rows would collect
    millions of rows at 100 TB."""
    src = str(tmp_path / "src.parquet")
    _tiny_df(spark).write.parquet(src)

    try:  # pyspark>=4 concrete class; the facade's collect is never bound
        from pyspark.sql.classic.dataframe import DataFrame as ConcreteDF
    except ImportError:  # pragma: no cover - older pyspark
        ConcreteDF = DataFrame

    collected: list[tuple[str, ...]] = []
    orig = ConcreteDF.collect

    def spying_collect(self):
        collected.append(tuple(self.columns))
        return orig(self)

    monkeypatch.setattr(ConcreteDF, "collect", spying_collect)
    out = str(tmp_path / "store")
    encode(spark, src, out, n_partitions=2)
    # zero collects is the ideal (the happy path computes the rollup with
    # pyarrow on the driver); any collect that does happen must be bounded
    for cols in collected:
        assert cols in _ALLOWED_COLLECTS, f"unbounded driver collect: {cols}"
    # the store is still fully decodable after the spy run
    monkeypatch.setattr(ConcreteDF, "collect", orig)
    assert decode(spark, out).count() == 40


def test_train_ivf_warns_then_raises_instead_of_limit_fallback(spark):
    """An empty sample must warn + re-sample wider, and an impossible
    n_rows must raise — never silently fall back to the first-partition
    limit() path (round-3 advice)."""
    from clj_orc_spark.operators.similarity import train_ivf

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "vec_id int, embedding array<double>"
    )
    with pytest.warns(UserWarning, match="re-sampling"):
        with pytest.raises(ValueError, match="empty even at 10x"):
            train_ivf(df, n_centroids=2, sample_rows=1, n_rows=10**9)


def test_chao1_extrapolates_unseen_cardinality():
    """A moderate-cardinality column whose tail extends beyond the sample
    must not price dict codes on tail=0: chao1 recovers ~the true distinct
    count from sample singletons/doubletons (round-3 advice)."""
    rng = np.random.default_rng(0)
    true_card = 150_000
    arr = rng.integers(0, true_card, size=4 * INT_SAMPLE + 1).astype(np.int64)
    st = int_stats(arr)
    assert not st["distinct_exact"]
    # sampled card alone is ~124k here; chao1 must close most of the gap
    assert st["n_distinct"] >= 140_000
    assert st["n_distinct"] <= int(1.15 * true_card)


def test_chao1_exact_small_arrays_unchanged():
    arr = np.array([1, 1, 2, 3, 3, 3, 9], dtype=np.int64)
    st = int_stats(arr)
    assert st["distinct_exact"] and st["n_distinct"] == 4


def test_exact_near_dup_guard_raises_at_scale(spark):
    """The O(n^2) exact join is a test-only oracle baseline: beyond the cap
    it must refuse loudly instead of launching a broadcast cartesian."""
    from pyspark.sql import functions as F

    from clj_orc_spark.operators import cosine_near_dups

    big = spark.range(10_001).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="capped at"):
        cosine_near_dups(big, threshold=0.9)


def test_token_range_zone_map_prunes_and_filters(spark, tmp_path):
    """Token-VALUE zone maps (recorded since round 2, queryable since round
    4): a vocabulary-range decode must skip chunks whose token_values
    [min,max] cannot intersect the range, and exactly filter the survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()

    def tbl(prefix, base):
        return pa.table({
            "doc_id": [f"{prefix}{i:03d}" for i in range(50)],
            "tokens": pa.array(
                [[base + i] * 3 for i in range(50)],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([3] * 50, type=pa.int32()),
            "source": [f"s-{prefix}"] * 50,
        })

    pq.write_table(tbl("low", 1), str(src / "low.parquet"))
    pq.write_table(tbl("high", 1000), str(src / "high.parquet"))

    out = str(tmp_path / "store")
    encode(spark, str(src), out, n_partitions=2)

    from clj_orc_spark.pipeline.decode import _stat_pruned_work

    pruned = _stat_pruned_work(spark, out, None, None, None, None, (900, None))
    assert pruned is not None
    kept = {cid for _, cids in pruned for cid in cids}
    total = (
        spark.read.parquet(out + "/manifest/chunks")
        .select("chunk_id").distinct().count()
    )
    assert 0 < len(kept) < total, (len(kept), total)  # real chunk skipping

    got = sorted(
        r.doc_id
        for r in decode(spark, out, token_range=(900, None)).collect()
    )
    assert got == [f"high{i:03d}" for i in range(50)]

    # two-sided range and row-exactness: only the row CONTAINING token 1001
    two = sorted(
        r.doc_id
        for r in decode(spark, out, token_range=(1001, 1001)).collect()
    )
    assert two == ["high001"]

    with pytest.raises(ValueError, match="at least one bound"):
        decode(spark, out, token_range=(None, None))
    with pytest.raises(TypeError, match="ints"):
        decode(spark, out, token_range=("1", None))
    with pytest.raises(ValueError, match="requires 'tokens'"):
        decode(spark, out, columns=["doc_id"], token_range=(1, None))


def test_batch_minhash_bit_identical_to_scalar():
    """The batch shingle/signature path must reproduce the per-document
    path's signatures bit-for-bit (incl. short-text fallback, unicode,
    empty strings, and docs long enough to span several MINHASH_BLOCKs)."""
    import numpy as np

    from clj_orc_spark.operators.dedup import (
        MINHASH_BLOCK,
        _perm_params,
        _shingle_hashes,
        _shingle_hashes_batch,
        minhash_signature,
        minhash_signatures_batch,
    )

    rng = np.random.default_rng(7)
    long_doc = "".join(rng.choice(list("abcdefgh "), 3 * MINHASH_BLOCK + 17))
    texts = ["", "ab", "abcd", "hello world " * 50, "üñïçødé πξ" * 3,
             "the quick brown fox", long_doc, "x"]
    a, b = _perm_params(16)
    expected = np.stack([
        minhash_signature(_shingle_hashes(t, 5), a, b) for t in texts
    ])
    h_all, seg = _shingle_hashes_batch(texts, 5)
    got = minhash_signatures_batch(h_all, seg, a, b)
    assert np.array_equal(got, expected)


def test_batch_minhash_empty_batch():
    from clj_orc_spark.operators.dedup import (
        _perm_params,
        _shingle_hashes_batch,
        minhash_signatures_batch,
    )

    a, b = _perm_params(8)
    h_all, seg = _shingle_hashes_batch([], 5)
    assert minhash_signatures_batch(h_all, seg, a, b).shape == (0, 8)


# --- Y4M video (round-3 judge item #7) --------------------------------------


def test_y4m_roundtrip_and_sampling():
    import numpy as np

    from clj_orc_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_frames,
        video_feature,
    )

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (12, 16, 20), dtype=np.uint8)
    for cs in (b"mono", b"420"):
        payload = encode_y4m(frames, fps=(10, 1), colorspace=cs)
        back, fps = decode_y4m(payload)
        assert fps == (10, 1)
        assert np.array_equal(back, frames)  # luma survives bit-exactly
    # 10 fps, sample every 500 ms → every 5th frame
    got = sample_frames(encode_y4m(frames, (10, 1)), every_ms=500)
    assert len(got) == 3 and np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[5])
    feat = video_feature(encode_y4m(frames, (10, 1)))
    assert feat.shape == (64,) and np.isfinite(feat).all()


def test_y4m_errors():
    import numpy as np
    import pytest as _pt

    from clj_orc_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_frames,
    )

    frames = np.zeros((2, 8, 8), dtype=np.uint8)
    good = encode_y4m(frames)
    with _pt.raises(ValueError, match="truncated"):
        decode_y4m(good[:-10])
    with _pt.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx")
    with _pt.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(b"\x00\x00\x00\x18ftypmp42")  # mp4 magic → stub
    with _pt.raises(NotImplementedError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W8 H8 F25:1 C411\nFRAME\n" + b"\x00" * 96)


def test_video_feature_through_spark(spark):
    """The real-codec mapInPandas path handles video rows end-to-end."""
    from pyspark.sql import functions as F

    from clj_orc_spark.operators.multimodal import (
        extract_features,
        real_media_table,
    )

    media = real_media_table(spark, n_rows=16, seed=42)
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    feats = extract_features(media, fake=False)
    rows = feats.where(F.col("kind") == "video").collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r["feature"]) == 64


def test_patched_for_recursive_base_roundtrip():
    """Round-4 compression chip: skewed base streams re-encode recursively
    (meta['base']) and must round-trip bit-exactly, smaller than flat."""
    import numpy as np

    from clj_orc_spark.kernels.bitpack import PatchedFor, packed_nbytes

    rng = np.random.default_rng(42)
    vals = np.minimum(rng.zipf(1.3, 200_000), 10_000).astype(np.int32)
    p, m = PatchedFor.encode(vals)
    assert m["base"] is not None, "skewed base should trigger recursion"
    assert np.array_equal(PatchedFor.decode(p, m), vals)
    # whole payload beats the flat-base formulation it replaced
    flat_equiv = (packed_nbytes(m["n"], m["width"]) + (m["n"] + 7) // 8
                  + packed_nbytes(m["n_exc"], m["full_width"] - m["width"]))
    assert len(p) < flat_equiv
    # int64 path too
    p64, m64 = PatchedFor.encode(vals.astype(np.int64))
    assert np.array_equal(PatchedFor.decode(p64, m64), vals.astype(np.int64))


def test_duplicate_clusters_connected_components(spark):
    """duplicate_clusters must label every member of a component with the
    component's minimum id — including long chains (pointer jumping)."""
    from clj_orc_spark.operators import duplicate_clusters

    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(20)]  # 21-node chain
    pairs = chain + [("b1", "b2"), ("b2", "b3"), ("a9", "a1")]
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {r["id"]: r["rep"] for r in duplicate_clusters(df).collect()}
    assert len(got) == 21 + 3 + 2
    assert all(got[f"c{i:02d}"] == "c00" for i in range(21))
    assert got["b1"] == got["b2"] == got["b3"] == "b1"
    assert got["a9"] == got["a1"] == "a1"


def test_repetition_features(spark):
    from clj_orc_spark.operators import repetition_stats

    df = spark.createDataFrame(
        [("a", "spam spam spam spam"), ("b", "all words here differ")],
        "doc_id string, text string",
    )
    r = {x["doc_id"]: x["rep"] for x in repetition_stats(df).collect()}
    assert r["a"]["dup_word_frac"] == 0.75
    assert r["a"]["dup_bigram_frac"] == 0.6667
    assert r["b"]["dup_word_frac"] == 0.0
    assert r["b"]["dup_bigram_frac"] == 0.0
    assert r["a"]["n_words"] == r["b"]["n_words"] == 4


def test_duplicate_clusters_random_graphs_match_union_find(spark):
    """Distributed components must equal a driver-side union-find on random
    graphs (seeded) — including forests, cliques, and isolated pairs."""
    import numpy as np

    from clj_orc_spark.operators import duplicate_clusters

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 60
        edges = [
            (f"n{a:02d}", f"n{b:02d}")
            for a, b in rng.integers(0, n, (40, 2)) if a != b
        ]
        if not edges:
            continue
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}

        df = spark.createDataFrame(edges, "id_a string, id_b string")
        got = {r["id"]: r["rep"] for r in duplicate_clusters(df).collect()}
        assert got == expected, f"seed={seed}"


def test_duplicate_clusters_empty(spark):
    from clj_orc_spark.operators import duplicate_clusters

    empty = spark.createDataFrame([], "id_a string, id_b string")
    assert duplicate_clusters(empty).count() == 0


# --- round-4 self-review fixes ----------------------------------------------


def test_null_columns_roundtrip_exactly(spark, tmp_path):
    """Round 4 refused NULLs loudly (they silently became INT_MIN sentinels);
    round 5 encodes them via per-payload validity bitmaps (the ORC/Arrow
    PRESENT-stream model) — null scalars, null list entries, and nulls
    INSIDE list values all round-trip exactly (see also
    test_nullable_schema.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array(["a", "b", None, "d"], type=pa.string()),
        "tokens": pa.array(
            [[1], None, [2, None, 4], []], type=pa.list_(pa.int32())
        ),
        "n_tok": pa.array([1, None, 3, 0], type=pa.int32()),
        "source": ["s", "s", None, "t"],
    })
    src = str(tmp_path / "nulls.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "store-nulls")
    encode(spark, src, out, n_partitions=1)
    got = sorted(
        decode(spark, out).collect(),
        key=lambda r: (r["doc_id"] is None, r["doc_id"]),
    )
    assert [
        (r["doc_id"], r["tokens"], r["n_tok"], r["source"]) for r in got
    ] == [
        ("a", [1], 1, "s"),
        ("b", None, None, "s"),
        ("d", [], 0, "t"),
        (None, [2, None, 4], 3, None),
    ]


def test_legacy_predicate_sugar_is_kind_checked(spark, tmp_path):
    """Legacy named predicates on a general store whose column kinds differ
    from the token table must raise, not silently prune (review finding #2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int32()),  # NUMERIC doc ids
        "tokens": pa.array([[1], [2], [3]], type=pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1, 1], type=pa.int32()),
        "source": pa.array([7, 8, 9], type=pa.int32()),  # numeric source
    })
    src = str(tmp_path / "numeric.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "store")
    encode(spark, src, out, n_partitions=1)
    with pytest.raises(TypeError, match="must be int"):
        decode(spark, out, doc_id_range=("a", "z"))
    with pytest.raises(TypeError, match="non-empty list of int"):
        decode(spark, out, source_in=["x"])
    # correctly-typed predicates on the same columns work
    assert decode(spark, out, ranges={"doc_id": (2, None)}).count() == 2
    assert decode(spark, out, isin={"source": [7, 9]}).count() == 2


def test_y4m_encode_rejects_non_420_chroma():
    import numpy as np
    import pytest as _pt

    from clj_orc_spark.operators.multimodal import encode_y4m

    frames = np.zeros((2, 8, 8), dtype=np.uint8)
    for cs in (b"422", b"444"):
        with _pt.raises(NotImplementedError):
            encode_y4m(frames, colorspace=cs)


def test_decode_plan_report(spark, tmp_path):
    """Zone-map observability: report how many chunks/files a predicated
    decode would touch, from the manifest alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clj_orc_spark.pipeline import decode_plan_report

    src = tmp_path / "src"
    src.mkdir()
    for prefix, base in (("low", 1), ("high", 1000)):
        pq.write_table(pa.table({
            "doc_id": [f"{prefix}{i:03d}" for i in range(50)],
            "tokens": pa.array([[base + i] * 3 for i in range(50)],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([3] * 50, type=pa.int32()),
            "source": [f"s-{prefix}"] * 50,
        }), str(src / f"{prefix}.parquet"))
    out = str(tmp_path / "store")
    encode(spark, str(src), out, n_partitions=2)

    full = decode_plan_report(spark, out)
    assert full["chunks_kept"] == full["chunks_total"] > 0

    pruned = decode_plan_report(spark, out, ranges={"tokens": (900, None)})
    assert 0 < pruned["chunks_kept"] < pruned["chunks_total"]
    assert pruned["files_kept"] <= pruned["files_total"]

    none = decode_plan_report(spark, out, isin={"source": ["nope"]})
    assert none["chunks_kept"] == 0

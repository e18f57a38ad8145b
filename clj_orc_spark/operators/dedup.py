"""Deduplication operators for training-data pipelines.

Four dedup modes over a documents table, each designed for the 100 TB case:

* :func:`exact_dedup` — hash-groupBy; one shuffle of (hash, id), never of text.
* :func:`minhash_lsh` — shingle → MinHash signature (vectorized numpy inside a
  pandas UDF) → banded LSH bucket join; candidate verification by signature
  Jaccard.  The shuffle carries only (band_hash, id, signature), not text.
* :func:`simhash` — 64-bit SimHash + pigeonhole banding (k-bit Hamming
  neighbors must share one of k+1 bands) → candidate pairs + exact Hamming
  verify, all in Spark SQL expressions after the signature UDF.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard on candidate pairs
  (the verification stage; quadratic only within capped LSH buckets).

Buckets larger than ``max_bucket`` are dropped (standard LSH practice —
they're near-identical boilerplate clusters; dropping bounds the worst-case
join output, which is what actually kills LSH joins at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, width: int) -> np.ndarray:
    """Rolling byte-window hashes (the FSST window trick, reused).

    A text shorter than the window is its OWN single shingle — hashing the
    full byte string, not a constant sentinel: a shared sentinel would give
    every short text an identical MinHash signature and report all pairs of
    short texts as est_jaccard=1.0 duplicates."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(b) - width + 1
    if n <= 0:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for byte in b.astype(np.uint64):
                h = h * np.uint64(131) + byte
        return np.array([h + np.uint64(1)], dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    d = b.astype(np.uint64)
    for j in range(width):
        h = h * np.uint64(131) + d[j : j + n]
    return np.unique(h)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
    return a, b


#: shingles per vectorized block — caps the (num_perm × block) temporary at
#: ~32 MB for 64 perms, REGARDLESS of document length (a single 10 MB web
#: document has ~10^7 shingles; the unblocked num_perm × n_shingles matrix
#: would be ~5 GB — an executor OOM)
MINHASH_BLOCK = 65_536


def minhash_signature(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature of one document's shingle-hash set: min over
    shingles of ``(a*h + b) mod p`` per permutation, accumulated in
    ``MINHASH_BLOCK``-shingle blocks — bit-identical to the single-shot
    matrix, flat memory."""
    sig = np.full(len(a), MERSENNE, dtype=np.uint64)
    for lo in range(0, len(h), MINHASH_BLOCK):
        blk = h[lo : lo + MINHASH_BLOCK]
        vals = (a[:, None] * blk[None, :] + b[:, None]) % MERSENNE
        np.minimum(sig, vals.min(axis=1), out=sig)
    return sig.astype(np.int64)


def _shingle_hashes_batch(
    texts: list, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for a WHOLE Arrow batch: one rolling-hash pass over one
    concatenated byte buffer, windows gathered per document by index
    arithmetic — no per-document numpy dispatch (the batch-level analog of
    :func:`simhash_batch`, replacing the round-3 per-doc loop).

    Returns ``(h_all, seg_starts)``: concatenated per-doc shingle hashes and
    the ``n_docs+1`` segment offsets.  Bit-identical to
    :func:`_shingle_hashes` per document, minus the ``np.unique`` dedup —
    a MinHash min over a multiset equals the min over its set, so
    signatures are unchanged (pinned by test_round4_fixes)."""
    encs = [(t or "").encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(e) for e in encs], dtype=np.int64)
    nd = len(encs)
    doc_starts = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_starts[1:])
    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)

    win_counts = np.maximum(lens - width + 1, 0)
    seg_lens = np.where(win_counts > 0, win_counts, 1)
    seg_starts = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(seg_lens, out=seg_starts[1:])
    out = np.empty(int(seg_starts[-1]), dtype=np.uint64)

    npos = len(buf) - width + 1
    if npos > 0 and win_counts.any():
        h = np.zeros(npos, dtype=np.uint64)
        d = buf.astype(np.uint64)
        for j in range(width):  # width (~5) passes over the whole buffer
            h = h * np.uint64(131) + d[j : j + npos]
        has = np.flatnonzero(win_counts > 0)
        cnts = win_counts[has]
        csum = np.cumsum(cnts)
        off = np.arange(int(csum[-1]), dtype=np.int64) - np.repeat(
            csum - cnts, cnts
        )
        # windows crossing document boundaries are never gathered: each
        # doc's valid window starts are doc_start .. doc_start+len-width
        out[np.repeat(seg_starts[has], cnts) + off] = h[
            np.repeat(doc_starts[has], cnts) + off
        ]
    short = np.flatnonzero(win_counts == 0)
    if len(short):
        # a text shorter than the window is its OWN single shingle (+1 —
        # see _shingle_hashes): ≤ width-1 vectorized passes over short docs
        sh = np.zeros(len(short), dtype=np.uint64)
        slens = lens[short]
        with np.errstate(over="ignore"):
            for j in range(int(slens.max()) if len(slens) else 0):
                act = np.flatnonzero(slens > j)
                sh[act] = sh[act] * np.uint64(131) + buf[
                    doc_starts[short[act]] + j
                ].astype(np.uint64)
        out[seg_starts[short]] = sh + np.uint64(1)
    return out, seg_starts


def minhash_signatures_batch(
    h_all: np.ndarray, seg_starts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs × num_perm) MinHash matrix via blockwise ``reduceat`` over the
    concatenated shingle array — flat memory (one MINHASH_BLOCK temp per
    permutation pass) regardless of document length, zero per-document
    Python.  Same elementwise ``(a*h + b) mod p`` arithmetic as
    :func:`minhash_signature`, so signatures are bit-identical."""
    nd = len(seg_starts) - 1
    sig = np.full((nd, len(a)), MERSENNE, dtype=np.uint64)
    total = int(seg_starts[-1]) if nd else 0
    for lo in range(0, total, MINHASH_BLOCK):
        hi = min(total, lo + MINHASH_BLOCK)
        blk = h_all[lo:hi]
        d0 = int(np.searchsorted(seg_starts, lo, side="right")) - 1
        d1 = int(np.searchsorted(seg_starts, hi, side="left"))
        rel = np.maximum(seg_starts[d0:d1] - lo, 0)
        for j in range(len(a)):
            vals = (a[j] * blk + b[j]) % MERSENNE
            np.minimum(
                sig[d0:d1, j],
                np.minimum.reduceat(vals, rel),
                out=sig[d0:d1, j],
            )
    return sig.astype(np.int64)


def make_minhash_udf(num_perm: int = 64, shingle: int = 5, seed: int = 42):
    """pandas UDF: text → array<bigint> MinHash signature (batch-vectorized:
    the whole Arrow batch is shingled and min-reduced in numpy)."""
    a, b = _perm_params(num_perm, seed)

    @pandas_udf("array<long>")
    def minhash(texts: pd.Series) -> pd.Series:
        h_all, seg = _shingle_hashes_batch(list(texts), shingle)
        return pd.Series(list(minhash_signatures_batch(h_all, seg, a, b)))

    return minhash


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 64, shingle: int = 5,
) -> DataFrame:
    mh = make_minhash_udf(num_perm, shingle)
    return df.select(F.col(id_col).alias("id"), mh(F.col(text_col)).alias("sig"))


def capped_bucket_pairs(
    exploded: DataFrame, payload: str, max_bucket: int
) -> DataFrame:
    """Within-bucket pairs (bucket key = ``bi``, ``bh``) with the size cap
    enforced **before** any bucket is materialized.

    A map-side-combined count pass first drops buckets with < 2 or
    > ``max_bucket`` members; only surviving (small) buckets flow into the
    ``collect_list`` — so a 10M-member boilerplate bucket costs one counter,
    never an executor-memory array.  The count agg, the semi-join, and the
    final groupBy all hash-partition on the same (bi, bh) keys, so the extra
    pass reuses the shuffle partitioning instead of adding a new exchange
    shape.  Output columns: id_a, id_b, {payload}_a, {payload}_b.
    """
    keys = ["bi", "bh"]
    small = (
        exploded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
        .drop("_n")
    )
    kept = exploded.join(small, keys)
    # sort_array makes list order deterministic (struct sorts by id first):
    # expansion emits (earlier, later) tuples, so without the sort any pair
    # whose task-dependent collect_list order disagreed with id order was
    # silently dropped by the id_a < id_b filter — nondeterministic recall
    grouped = kept.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("id"), F.col(payload)))
        ).alias("members")
    )
    a, b = f"{payload}_a", f"{payload}_b"
    return grouped.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "members",
                        lambda m, i: F.transform(
                            F.slice("members", i + 2, F.size("members")),
                            lambda o: F.struct(
                                m["id"].alias("id_a"), o["id"].alias("id_b"),
                                m[payload].alias(a), o[payload].alias(b),
                            ),
                        ),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("p")
    ).select("p.*")


def minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle)

    band_cols = [
        F.xxhash64(
            F.lit(bi),
            *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)],
        ).alias(f"b{bi}")
        for bi in range(bands)
    ]
    banded = sigs.select("id", "sig", F.array(*band_cols).alias("bands"))
    exploded = banded.select(
        "id", "sig", F.posexplode("bands").alias("bi", "bh")
    )
    pairs = capped_bucket_pairs(exploded, "sig", max_bucket)

    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z))
        / F.lit(num_perm)
    )
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
        .distinct()
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative per exact content hash; never shuffles text.

    The hash is 128-bit (md5), not xxhash64: at the 10^10-document scale a
    64-bit hash hits its birthday bound and silently merges distinct
    documents; 128 bits keeps the collision odds negligible without
    shuffling text for an exact-equality confirm."""
    h = F.md5(F.col(text_col).cast("binary"))
    return (
        df.select(h.alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# offset basis kept from the original scalar implementation (a truncated
# FNV-1a 64 basis) so vectorization preserves every signature bit-for-bit
FNV_OFFSET = np.uint64(1469598103934665603)
FNV_PRIME = np.uint64(1099511628211)


def fnv1a_slices(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a 64 over many byte slices of one buffer, column-at-a-time.

    One vectorized pass per byte *position* (bounded by the longest word),
    not per word — the batch-level replacement for a per-word Python loop.
    Bit-exact with the scalar FNV-1a: ``h = (h ^ byte) * prime mod 2**64``.
    """
    n = len(starts)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    maxlen = int(lens.max())
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = np.flatnonzero(lens > j)
            if len(active) == 0:
                break
            b = buf[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ b) * FNV_PRIME
    return h


def simhash_batch(texts, seed: int = 0) -> np.ndarray:
    """64-bit SimHash for a batch of texts, fully vectorized: all words of
    all rows are hashed by :func:`fnv1a_slices` in one numpy pass, the bit
    matrix comes from a single ``unpackbits``, and per-document votes are one
    ``reduceat`` along axis 0 — no per-word Python, no per-bit loop.

    ``seed`` perturbs every word hash (splitmix-style xor-multiply), so
    distinct seeds give genuinely independent signatures; seed=0 is the
    historical signature, bit-for-bit."""
    word_lists = [(t or "").lower().split() for t in texts]
    counts = np.array([len(ws) for ws in word_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    total = int(counts.sum())
    if total:
        # words contain no whitespace, and 0x20 never occurs inside a UTF-8
        # multibyte sequence — so one join+encode then splitting on byte
        # 0x20 recovers each word's exact encoded bytes
        joined = " ".join(w for ws in word_lists for w in ws)
        buf = np.frombuffer(joined.encode("utf-8", "ignore"), dtype=np.uint8)
        sp = np.flatnonzero(buf == 0x20)
        starts = np.concatenate([[0], sp + 1])
        ends = np.concatenate([sp, [len(buf)]])
        hs = fnv1a_slices(buf, starts, ends - starts)
        if seed:
            with np.errstate(over="ignore"):
                hs = (hs ^ np.uint64(seed)) * np.uint64(0xBF58476D1CE4E5B9)
                hs ^= hs >> np.uint64(27)

        nz = np.flatnonzero(counts > 0)
        seg = np.concatenate([[0], np.cumsum(counts)])[:-1][nz]
        # 64 vectorized 1-D reduceats: measured 4x faster than one 2-D
        # unpackbits+reduceat(axis=0) (strided segment sums thrash cache)
        votes = np.empty((len(nz), 64), dtype=np.int64)
        for j in range(64):
            bit = ((hs >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            votes[:, j] = np.add.reduceat(bit, seg)
        score = votes * 2 - counts[nz][:, None]  # +1/-1 vote per bit
        sh_bits = (score > 0).astype(np.uint8)
        packed = np.packbits(sh_bits, axis=1, bitorder="little")
        out[nz] = np.ascontiguousarray(packed).view(np.uint64).ravel()
    return out.view(np.int64)  # wraparound into signed storage


def make_simhash_udf(seed: int = 0):
    """pandas UDF: text → 64-bit SimHash (see :func:`simhash_batch`;
    ``seed`` is threaded into the word hashing — previously it was accepted
    and silently ignored)."""

    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(list(texts), seed=seed))

    return simhash64


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, max_bucket: int = 64,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into ``max_hamming + 1`` bands; any pair
    within distance k must agree exactly on ≥1 band.
    """
    sh = make_simhash_udf()
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("sh"))
    band = [
        F.shiftrightunsigned(F.col("sh"), bi * width).bitwiseAND(
            F.lit((1 << width) - 1)
        ).alias(f"band{bi}")
        for bi in range(n_bands)
    ]
    banded = sigs.select("id", "sh", F.posexplode(F.array(*band)).alias("bi", "bh"))
    pairs = capped_bucket_pairs(banded, "sh", max_bucket)
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", dist)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS → ``(id, rep)`` with
    ``rep`` = the minimum id of the component — what a dedup pipeline
    actually consumes (keep ``rep``, drop the rest of each cluster).

    Min-label propagation with pointer jumping: each round takes the min
    label over neighbors, then short-circuits ``rep := rep(rep)``, so
    convergence is O(log diameter) rounds — near-dup graphs are
    boilerplate-chain shaped, diameters are tiny, and every round is two
    hash joins on (id, rep) pairs only (never text).  Deterministic:
    fixpoint checked by an order-insensitive xxhash64 digest.  Raises if
    ``max_iters`` rounds do not converge (a pathological graph should be
    loud, not silently half-clustered)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("rep", F.col("id"))
        .localCheckpoint()
    )

    def digest(df):
        # order-insensitive fixpoint fingerprint; bit_xor never overflows
        # (ANSI mode makes a sum of hashes throw on long overflow)
        row = df.agg(
            F.expr("bit_xor(xxhash64(id, rep))").alias("x"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (row["x"], row["n"])

    prev = digest(labels)
    for _ in range(max_iters):
        nmin = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src").agg(F.min("rep").alias("nmin"))
        )
        stepped = (
            labels.join(nmin, labels.id == nmin.src, "left")
            .select(
                "id",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))
                ).alias("rep"),
            )
        )
        # pointer jumping: rep := rep(rep) — halves chain depth per round
        rep_of = stepped.select(
            F.col("id").alias("rid"), F.col("rep").alias("rrep")
        )
        labels = (
            stepped.join(rep_of, stepped.rep == rep_of.rid, "left")
            .select(
                "id",
                F.coalesce(F.col("rrep"), F.col("rep")).alias("rep"),
            )
            .localCheckpoint()  # cut lineage: iterative plans otherwise
        )  # grow exponentially and re-execute every prior round
        cur = digest(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iters} rounds"
    )


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (verification stage)."""
    grams = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size(F.split(F.col(text_col), r"\s+")) - n, F.lit(0))
        ),
        lambda i: F.concat_ws(
            " ", F.slice(F.split(F.col(text_col), r"\s+"), i + 1, n)
        ),
    )
    g = df.select(F.col(id_col).alias("id"), F.array_distinct(grams).alias("grams"))
    joined = (
        pairs.join(g.withColumnRenamed("grams", "ga"), pairs.id_a == g.id)
        .drop("id")
        .join(
            g.withColumnRenamed("grams", "gb").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return joined.select(
        "id_a", "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )

"""SimHash signature micro-benchmark: vectorized batch path vs the round-1
per-word scalar loop, on a 10k-doc batch (VERDICT round-1 item 5 evidence).

Usage: python scripts/simhash_microbench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scalar_simhash(text: str) -> int:
    words = (text or "").lower().split()
    if not words:
        return 0

    def hash_word(w: str) -> int:
        h = 1469598103934665603
        for ch in w.encode("utf-8", "ignore"):
            h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        return h

    hs = np.array([hash_word(w) for w in words], dtype=np.uint64)
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    score = bits.sum(axis=0).astype(np.int64) * 2 - len(words)
    return int(np.packbits((score > 0).astype(np.uint8),
                           bitorder="little").view(np.uint64)[0])


def vectorized_batch(texts: list[str]) -> np.ndarray:
    """The operator's batch body (the same function the pandas UDF calls)."""
    from clj_orc_spark.operators.dedup import simhash_batch

    return simhash_batch(texts)


def main() -> None:
    import duckdb

    texts = duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.1/documents.parquet')"
        " LIMIT 10000"
    ).fetchdf()["text"].tolist()
    n_words = sum(len(t.split()) for t in texts)

    vectorized_batch(texts[:64])  # warmup: module imports, numpy caches
    scalar_simhash(texts[0])

    t0 = time.time()
    vec = vectorized_batch(texts)
    t_vec = time.time() - t0

    t0 = time.time()
    sca = np.array([scalar_simhash(t) for t in texts],
                   dtype=np.uint64).view(np.int64)
    t_sca = time.time() - t0

    assert np.array_equal(vec, sca), "vectorized != scalar"
    print(pd.Series({
        "docs": len(texts), "words": n_words,
        "vectorized_sec": round(t_vec, 3), "scalar_sec": round(t_sca, 3),
        "speedup": round(t_sca / t_vec, 1),
        "vectorized_docs_per_sec": round(len(texts) / t_vec, 0),
    }).to_json())


if __name__ == "__main__":
    main()

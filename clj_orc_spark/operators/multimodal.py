"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` UDF signatures, partitioning by media type/size — while the
actual codec work (JPEG decode, audio resample, video frame extraction) is
stubbed: the image/audio libraries are not in this container, so each decode
stub either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode), clearly
marked.  Swapping the fake for Pillow/torchaudio/ffmpeg changes one function
body and none of the distributed plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA_DDL = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, "
    "codec:string>"
)

FEATURE_DIM = 64


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: seeded by the
    payload's content hash, so tests are exact and repeatable.  REPLACE with
    a real model/codec when the media libs are available."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(payload))
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, meta: dict):  # pragma: no cover - strict stub
    """STUB: real implementation needs an image codec (Pillow/libjpeg)."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "environment; use extract_features(..., fake=True) for plumbing tests"
    )


def sample_frames(payload: bytes, meta: dict, every_ms: int = 1000):  # pragma: no cover
    """STUB: real implementation needs ffmpeg/pyav."""
    raise NotImplementedError("video frame sampling requires ffmpeg/pyav")


def extract_features(
    df: DataFrame, dim: int = FEATURE_DIM, batch_limit: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Distributed feature extraction over binary payloads via mapInPandas.

    Real at scale: Arrow-batched binary transfer, bounded batch sizes (media
    payloads are large — ``batch_limit`` rows per pandas batch keeps executor
    memory flat), output is a fixed-dim float array per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                piece = pdf.iloc[lo : lo + batch_limit]
                if fake:
                    feats = [
                        _fake_feature(p, dim).tolist() for p in piece["payload"]
                    ]
                else:  # pragma: no cover
                    feats = [decode_image(p, {}) for p in piece["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": piece["media_id"].values,
                        "kind": piece["kind"].values,
                        "feature": feats,
                    }
                )

    return df.mapInPandas(run, "media_id string, kind string, feature array<float>")


def media_partition_plan(df: DataFrame, bytes_per_task: int = 256 << 20) -> DataFrame:
    """Partition media rows by (kind, size-bucket) so one task never holds a
    pathological mix of 4 GB videos — same explicit-skew philosophy as the
    token-table encode plan (pipeline/skew.py)."""
    size = F.octet_length("payload")
    bucket = F.floor(F.log2(F.greatest(size, F.lit(1)))).cast("int")
    return df.withColumn("size_bucket", bucket).repartition(
        "kind", "size_bucket"
    )


def fake_media_table(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = rng.bytes(rng.integers(128, 4096))
        rows.append(
            (
                f"m-{i:06d}", kind, bytearray(payload),
                (256, 256, 16_000, 1_000, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)

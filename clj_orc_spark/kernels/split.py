"""Byte-stream split — the float-column workhorse (Parquet
BYTE_STREAM_SPLIT analog, a lightweight transform, not entropy coding).

IEEE-754 columns rarely compress as whole words: the mantissa low bytes are
near-random while the sign/exponent high bytes are highly repetitive.
Splitting the k bytes of each value into k contiguous planes isolates that
structure so the existing run-length kernel can exploit it — each plane is
sub-encoded with the better of RLE or raw bytes, independently.

Operates on the column's *bit pattern* (uint32/uint64 view — the engine
never reinterprets float VALUES, so NaN payload bits survive exactly; the
reference's NaN→nil normalization at `src/orc/col.clj:73-74` is explicitly
NOT replicated, per the bit-identity contract).  Registered as an int codec
so any integer column may also select it, though floats are where it wins.
"""

from __future__ import annotations

import numpy as np

from .base import pack_sections, register, split_sections
from .rle import Rle, run_starts


@register("int")
class ByteSplit:
    name = "byte_split"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        dtype = str(arr.dtype)
        n = len(arr)
        item = arr.dtype.itemsize
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype,
                         "sections": [], "planes": []}
        # little-endian plane j = byte j of every value, contiguous
        mat = np.ascontiguousarray(arr).view(np.uint8).reshape(n, item)
        sections, planes = [], []
        for j in range(item):
            plane = np.ascontiguousarray(mat[:, j])
            rp, rm = Rle.encode(plane)
            if len(rp) < n:
                sections.append(rp)
                planes.append(rm)
            else:
                sections.append(plane.tobytes())
                planes.append(None)
        payload, lens = pack_sections(*sections)
        return payload, {"codec": cls.name, "n": n, "dtype": dtype,
                         "sections": lens, "planes": planes}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        n = meta["n"]
        dtype = np.dtype(meta["dtype"])
        if n == 0:
            return np.empty(0, dtype=dtype)
        parts = split_sections(payload, meta["sections"])
        mat = np.empty((n, dtype.itemsize), dtype=np.uint8)
        for j, (raw, pm) in enumerate(zip(parts, meta["planes"])):
            if pm is None:
                mat[:, j] = np.frombuffer(raw, dtype=np.uint8, count=n)
            else:
                mat[:, j] = Rle.decode(raw, pm)
        return mat.reshape(-1).view(dtype).copy()

    @staticmethod
    def estimate(stats: dict) -> int:
        # per-plane: runs priced at ~2.5 B each (uint8 value + packed length)
        # vs n raw bytes — requires stats["plane_runs"] from float_stats
        runs = stats.get("plane_runs")
        if runs is None:
            return 1 << 62  # not a candidate without plane stats
        n = stats["n"]
        return sum(min(n, int(r) * 2 + max(2, int(r) // 4) + 48) for r in runs)


def plane_run_counts(arr: np.ndarray, sample: int = 1 << 17) -> list[int]:
    """Scaled run counts per byte plane on a contiguous head sample."""
    n = len(arr)
    if n == 0:
        return [0] * arr.dtype.itemsize
    k = min(n, sample)
    mat = np.ascontiguousarray(arr[:k]).view(np.uint8).reshape(k, -1)
    scale = n / k
    return [
        max(1, int(len(run_starts(np.ascontiguousarray(mat[:, j]))) * scale))
        for j in range(mat.shape[1])
    ]

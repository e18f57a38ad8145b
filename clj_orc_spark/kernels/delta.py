"""Delta / frame-of-reference-on-differences codec (ORC RLEv2-delta analog).

Ideal for monotone sequences — in this engine, the int64 *offsets index* that
flattens ``tokens: array<int32>`` into a values vector, the same
offsets+values layout the reference slices per row for ORC list vectors
(`src/orc/col.clj:114-116`).  Differences are taken with wraparound int64
arithmetic so any input (including non-monotone) round-trips bit-identically.
"""

from __future__ import annotations

import numpy as np

from .base import _ref_u64, register
from .bitpack import packed_nbytes
from .rle import _decode_int_sub, _encode_int_sub


@register("int")
class Delta:
    name = "delta"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        dtype = str(arr.dtype)
        n = len(arr)
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype,
                         "first": 0, "diffs": None}
        a64 = arr.astype(np.int64, copy=False).view(np.uint64)
        diffs = (a64[1:] - a64[:-1]).view(np.int64)  # wraparound-exact
        payload, dm = _encode_int_sub(diffs)
        return payload, {"codec": cls.name, "n": n, "dtype": dtype,
                         "first": int(arr[0]), "diffs": dm}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        n = meta["n"]
        if n == 0:
            return np.empty(0, dtype=meta["dtype"])
        diffs = _decode_int_sub(payload, meta["diffs"]).astype(np.int64).view(np.uint64)
        out = np.empty(n, dtype=np.uint64)
        out[0] = _ref_u64(meta["first"])
        np.cumsum(diffs, out=out[1:])
        out[1:] += out[0]
        if meta["dtype"] == "uint64":
            return out
        return out.view(np.int64).astype(meta["dtype"], copy=False)

    @staticmethod
    def estimate(stats: dict) -> int:
        return packed_nbytes(max(stats["n"] - 1, 0), stats["delta_width"]) + 24

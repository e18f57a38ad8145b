"""Run-length encoding (ORC RLEv2 short-repeat / run-length analog).

Run boundaries are found vectorized with ``np.diff`` — no per-value loop
(contrast the reference's per-cell interpreted decode,
`src/orc/core.clj:28-32`).  Run values and run lengths are each sub-encoded
with the best of the int kernels (frame-of-reference bit-pack / patched base),
mirroring how ORC RLEv2 bit-packs its literals.
"""

from __future__ import annotations

import numpy as np

from .base import pack_sections, register, split_sections
from .bitpack import decode_int_sub, encode_int_sub, packed_nbytes

# sub-stream helpers live in bitpack (shared with PatchedFor's recursive
# exception encoding); keep the private aliases for existing importers
_encode_int_sub = encode_int_sub
_decode_int_sub = decode_int_sub


def run_starts(arr: np.ndarray) -> np.ndarray:
    """Indices where a new run begins (always includes 0 for non-empty)."""
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    return np.concatenate([[0], np.flatnonzero(np.diff(arr) != 0) + 1])


@register("int")
class Rle:
    name = "rle"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        dtype = str(arr.dtype)
        n = len(arr)
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype, "sections": [],
                         "values": None, "lengths": None}
        starts = run_starts(arr)
        values = arr[starts]
        lengths = np.diff(np.concatenate([starts, [n]]))
        vp, vm = _encode_int_sub(values)
        lp, lm = _encode_int_sub(lengths.astype(np.int64))
        payload, sections = pack_sections(vp, lp)
        return payload, {"codec": cls.name, "n": n, "dtype": dtype,
                         "sections": sections, "values": vm, "lengths": lm}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        if meta["n"] == 0:
            return np.empty(0, dtype=meta["dtype"])
        vp, lp = split_sections(payload, meta["sections"])
        values = _decode_int_sub(vp, meta["values"])
        lengths = _decode_int_sub(lp, meta["lengths"])
        return np.repeat(values, lengths).astype(meta["dtype"], copy=False)

    @staticmethod
    def estimate(stats: dict) -> int:
        # runs × (value width + length width), both frame-of-reference packed
        n_runs = stats["n_runs"]
        return packed_nbytes(n_runs, stats["for_width"]) + packed_nbytes(
            n_runs, stats["run_len_width"]
        ) + 32

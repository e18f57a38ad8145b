"""Plain (uncompressed) codecs — the fallback every selector needs.

For strings the payload keeps the exact offsets+data layout of the input
(`StringCol`), with offsets delta-encoded (they are monotone by construction,
so delta ≈ the per-row lengths — the same relationship the reference exploits
reading ORC list vectors, `src/orc/col.clj:114-116`).
"""

from __future__ import annotations

import numpy as np

from .base import StringCol, pack_sections, register, split_sections
from .delta import Delta


@register("int")
class PlainInt:
    name = "plain_int"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        return np.ascontiguousarray(arr).tobytes(), {
            "codec": cls.name, "n": len(arr), "dtype": str(arr.dtype)}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        return np.frombuffer(payload, dtype=meta["dtype"], count=meta["n"]).copy()

    @staticmethod
    def estimate(stats: dict) -> int:
        return stats["n"] * stats["itemsize"]


@register("str")
class PlainStr:
    name = "plain_str"

    @classmethod
    def encode(cls, col: StringCol) -> tuple[bytes, dict]:
        op, om = Delta.encode(col.offsets)
        payload, sections = pack_sections(op, col.data)
        return payload, {"codec": cls.name, "n": col.n, "sections": sections,
                         "offsets": om}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> StringCol:
        op, data = split_sections(payload, meta["sections"])
        offsets = Delta.decode(op, meta["offsets"])
        return StringCol(bytes(data), offsets)

    @staticmethod
    def estimate(stats: dict) -> int:
        return stats["data_bytes"] + stats["n"] * 2 + 24

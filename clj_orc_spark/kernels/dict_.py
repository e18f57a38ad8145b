"""Dictionary encoding for int and string columns (ORC DICTIONARY_V2 analog).

The ORC writer flips between dictionary and direct encoding by a distinct-ratio
threshold (``orc.dictionary.key.threshold``); our selector makes that decision
explicitly and records it in the manifest (SURVEY.md §4.2).  Codes are
sub-encoded with the best int kernel (bit-pack / patched / RLE — RLE wins on
clustered or sorted data).
"""

from __future__ import annotations

import numpy as np

from .base import StringCol, pack_sections, register, split_sections
from .bitpack import ForBitpack, PatchedFor, bit_width, packed_nbytes
from .delta import Delta
from .rle import Rle, _decode_int_sub


def _encode_codes(codes: np.ndarray) -> tuple[bytes, dict]:
    """Codes are [0, card): pick cheapest of bitpack / patched / RLE."""
    best = None
    for codec in (ForBitpack, PatchedFor, Rle):
        p, m = codec.encode(codes)
        if best is None or len(p) < len(best[0]):
            best = (p, m)
    return best


def _decode_codes(payload: bytes, meta: dict) -> np.ndarray:
    if meta["codec"] == Rle.name:
        return Rle.decode(payload, meta)
    return _decode_int_sub(payload, meta)


@register("int")
class DictInt:
    name = "dict_int"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        dtype = str(arr.dtype)
        n = len(arr)
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype, "sections": [],
                         "uniques": None, "codes": None}
        uniques, codes = np.unique(arr, return_inverse=True)
        up, um = Delta.encode(uniques.astype(np.int64))  # sorted → delta-friendly
        cp, cm = _encode_codes(codes.astype(np.int64))
        payload, sections = pack_sections(up, cp)
        return payload, {"codec": cls.name, "n": n, "dtype": dtype,
                         "sections": sections, "uniques": um, "codes": cm}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        if meta["n"] == 0:
            return np.empty(0, dtype=meta["dtype"])
        up, cp = split_sections(payload, meta["sections"])
        uniques = Delta.decode(up, meta["uniques"])
        codes = _decode_codes(cp, meta["codes"])
        return uniques[codes].astype(meta["dtype"], copy=False)

    @staticmethod
    def estimate(stats: dict) -> int:
        card = stats["n_distinct"]
        code_w = bit_width(max(card - 1, 0))
        return packed_nbytes(stats["n"], code_w) + card * 4 + 48


@register("str")
class DictStr:
    name = "dict_str"

    @classmethod
    def encode(cls, col: StringCol) -> tuple[bytes, dict]:
        n = col.n
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "sections": [],
                         "uniques": None, "codes": None}
        import pandas as pd

        codes, uniques = pd.factorize(
            pd.Series(col.to_list()), sort=True
        )
        from .plain import PlainStr

        up, um = PlainStr.encode(StringCol.from_list(list(uniques)))
        cp, cm = _encode_codes(codes.astype(np.int64))
        payload, sections = pack_sections(up, cp)
        return payload, {"codec": cls.name, "n": n, "sections": sections,
                         "uniques": um, "codes": cm}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> StringCol:
        if meta["n"] == 0:
            return StringCol(b"", np.zeros(1, dtype=np.int64))
        from .plain import PlainStr

        up, cp = split_sections(payload, meta["sections"])
        uniq = PlainStr.decode(up, meta["uniques"])
        codes = _decode_codes(cp, meta["codes"])
        uo = uniq.offsets
        lens = (uo[1:] - uo[:-1])[codes]
        offsets = np.zeros(meta["n"] + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        # gather bytes vectorized: build index ranges per row
        starts = uo[:-1][codes]
        data_arr = np.frombuffer(uniq.data, dtype=np.uint8)
        total = int(offsets[-1])
        out = np.empty(total, dtype=np.uint8)
        # vectorized gather: for each output byte, source index =
        # starts[row] + (pos - offsets[row])
        rows = np.repeat(np.arange(meta["n"]), lens)
        pos = np.arange(total, dtype=np.int64)
        src = starts[rows] + (pos - offsets[:-1][rows])
        out[:] = data_arr[src]
        return StringCol(out.tobytes(), offsets)

    @staticmethod
    def estimate(stats: dict) -> int:
        card = stats["n_distinct"]
        code_w = bit_width(max(card - 1, 0))
        return packed_nbytes(stats["n"], code_w) + stats["distinct_bytes"] + card * 2 + 48

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
from .bitpack import (
    ForBitpack,
    PatchedFor,
    bit_lengths,
    bit_width,
    encode_int_sub,
    packed_nbytes,
)
from .delta import Delta
from .rle import Rle, _decode_int_sub, run_starts


def _encode_codes(codes: np.ndarray,
                  width_hint: int | None = None,
                  value_counts: np.ndarray | None = None) -> tuple[bytes, dict]:
    """Codes are [0, card): PatchedFor (whose width search includes the flat
    FOR layout as a candidate) vs RLE — RLE is only attempted when a cheap
    SAMPLED run count says it can win, because on run-free code streams
    building the run arrays costs a full pass for zero benefit.
    ``value_counts`` (code j occurs value_counts[j] times — the ranked
    counts, exact) lets every patched-FOR width search and recursion gate
    fold a card-sized histogram instead of re-scanning the codes."""
    best = PatchedFor.encode(codes, width_hint=width_hint,
                             value_counts=value_counts)
    # 8 evenly-spaced probe segments: run structure that only starts after
    # a high-churn prefix must still qualify RLE (a head-only probe would
    # permanently disqualify it, and a head-weighted one misprices
    # concentrated churn); the ≤7 false run-starts at the seams are noise
    # against the len//4 gate
    k = 1 << 13
    if len(codes) <= 8 * k:
        probe = codes
    else:
        starts = np.linspace(0, len(codes) - k, 8).astype(np.int64)
        probe = np.concatenate([codes[i : i + k] for i in starts])
    if len(run_starts(probe)) <= len(probe) // 4:
        p, m = Rle.encode(codes)
        if len(p) < len(best[0]):
            best = (p, m)
    return best


def _decode_codes(payload: bytes, meta: dict) -> np.ndarray:
    if meta["codec"] == Rle.name:
        return Rle.decode(payload, meta)
    return _decode_int_sub(payload, meta)


#: largest value RANGE whose bincount indices fit int32 (module constant so
#: tests can force the int64 branch without 2^31-element arrays)
_NARROW_IDX_MAX = 1 << 31


def ranked_value_counts(
    arr: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct values ordered by DESCENDING frequency (ties broken by
    value — deterministic) plus each input's rank code.

    Frequency ranking is the whole trick: on skewed data (zipfian token
    ids) the rank codes concentrate near 0, so the patched-FOR sub-encoding
    packs most of them in ~⌈H⌉ bits — dictionary + bit-packing reaching
    near-entropy sizes with NO entropy coder (measured 13.3 → 8.6
    bits/token on the bench token column).

    Narrow value ranges count via ``np.bincount`` + a direct lookup-table
    gather (O(n + range), no sort of n elements, int32 arithmetic when the
    range allows — a 32-bit input column never widens to int64 at all:
    wraparound int32 subtraction of ``lo`` is exact whenever the range fits
    int32, halving the pass's memory traffic); wide ranges fall back to
    ``np.unique``.  Returns ``(ranked_values int64, codes,
    counts_by_rank)`` — the counts give downstream encoders the exact code
    distribution for free."""
    n = len(arr)
    if arr.dtype == np.uint64:
        # same bits, wrap-identical values to the old astype(int64) copy
        arr = arr.view(np.int64)
    elif arr.dtype not in (np.int32, np.uint32, np.int64):
        arr = arr.astype(np.int64, copy=False)
    lo = int(arr.min())
    rng = int(arr.max()) - lo + 1
    if 0 < rng <= max(4 * n, 1 << 22):
        # index arithmetic stays int32 only when the RANGE fits int32 —
        # wider ranges (possible with huge chunk_bytes) keep int64
        # throughout, or the lookup scatter would wrap to negative slots
        narrow_idx = rng <= _NARROW_IDX_MAX
        idx_dtype = np.int32 if narrow_idx else np.int64
        if not narrow_idx:
            shifted = arr.astype(np.int64, copy=False) - lo
        elif arr.dtype == np.int32:
            # wraparound subtract: the true residual fits int32 (rng does),
            # so mod-2^32 arithmetic is exact — no int64 round trip
            shifted = arr - np.int32(lo)
        elif arr.dtype == np.uint32:
            shifted = (arr - np.uint32(lo)).view(np.int32)
        else:
            shifted = (arr - lo).astype(np.int32)
        counts_full = np.bincount(shifted, minlength=rng)
        nz = np.flatnonzero(counts_full)
        vals, counts = nz + lo, counts_full[nz]
        order = np.argsort(-counts, kind="stable")
        ranked = vals[order]
        lookup = np.empty(rng, dtype=idx_dtype)
        lookup[(ranked - lo).astype(idx_dtype)] = np.arange(
            len(ranked), dtype=idx_dtype
        )
        return ranked, lookup[shifted], counts[order]
    a64 = arr.astype(np.int64, copy=False)
    vals, counts = np.unique(a64, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    rank_of_sorted = np.empty(len(vals), dtype=np.int64)
    rank_of_sorted[order] = np.arange(len(vals))
    return vals[order], rank_of_sorted[np.searchsorted(vals, a64)], counts[order]


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
        ranked, codes, counts = ranked_value_counts(arr)
        # the dict itself is frequency-ordered (not sorted), so it packs
        # with the best int sub-kernel rather than delta
        up, um = encode_int_sub(ranked)
        # the code distribution is already known exactly from the counts —
        # derive the patched-FOR width from a card-sized histogram instead
        # of a full-stream bit-length pass
        code_full = bit_width(len(ranked) - 1)
        hist = np.zeros(code_full + 1, dtype=np.int64)
        np.add.at(
            hist, bit_lengths(np.arange(len(ranked), dtype=np.uint64)), counts
        )
        w, _ = PatchedFor.best_width_from_hist(hist, n, code_full)
        cp, cm = _encode_codes(
            codes.astype(np.int32, copy=False)
            if len(ranked) <= 1 << 31 else codes,
            width_hint=w,
            value_counts=counts,  # exact code distribution — rank j occurs
        )  # counts[j] times; gates fold this instead of scanning codes
        payload, sections = pack_sections(up, cp)
        return payload, {"codec": cls.name, "n": n, "dtype": dtype,
                         "sections": sections, "uniques": um, "codes": cm}

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        if meta["n"] == 0:
            return np.empty(0, dtype=meta["dtype"])
        up, cp = split_sections(payload, meta["sections"])
        um = meta["uniques"]
        # pre-ranking stores delta-coded the (sorted) dict; decode stays
        # compatible with both layouts
        if um["codec"] == Delta.name:
            uniques = Delta.decode(up, um)
        else:
            uniques = _decode_int_sub(up, um)
        codes = _decode_codes(cp, meta["codes"])
        # cast the card-sized dict BEFORE the n-sized gather: the gather
        # then moves target-width values (half the traffic for int32)
        return uniques.astype(meta["dtype"], copy=False)[codes]

    @staticmethod
    def estimate(stats: dict) -> int:
        if stats.get("dict_cost") is not None:
            return stats["dict_cost"]
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
        # frequency-rank the string dictionary too (ties broken by the
        # lexicographic factorize order — deterministic): skewed string
        # columns get near-zero codes for their dominant values, same
        # patched-FOR win as the int path
        counts = np.bincount(codes, minlength=len(uniques))
        order = np.argsort(-counts, kind="stable")
        rank = np.empty(len(uniques), dtype=np.int64)
        rank[order] = np.arange(len(uniques))
        codes = rank[codes]
        uniques = uniques[order]
        from .plain import PlainStr

        up, um = PlainStr.encode(StringCol.from_list(list(uniques)))
        cp, cm = _encode_codes(codes.astype(np.int32, copy=False)
                               if len(uniques) <= 1 << 31
                               else codes.astype(np.int64),
                               value_counts=counts[order])
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

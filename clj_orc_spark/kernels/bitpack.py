"""Bit-packing primitives + frame-of-reference and patched-base codecs.

Re-imagines ORC RLEv2 "direct" (fixed-width bit-packing) and "patched base"
sub-encodings — which the reference exercises through orc-core on every
`.addRowBatch` / `.nextBatch` (reference `test/orc/fixture.clj:51`,
`src/orc/read.clj:99`) — as vectorized numpy kernels (ORC v1 spec is public
knowledge; no reference code is involved, the reference contains no encoder).

* ``pack_bits`` / ``unpack_bits``: little-endian bit matrix + ``np.packbits``;
  fast paths for widths 8/16/32/64.
* ``ForBitpack``: subtract per-chunk min (frame of reference), pack residuals
  at ``ceil(log2(max_residual+1))`` bits.
* ``PatchedFor``: choose a narrower base width ``w`` minimizing exact encoded
  cost; values whose residual needs more than ``w`` bits become *exceptions*
  (positions + high bits stored separately) — ideal for skewed distributions
  such as zipfian token ids.
"""

from __future__ import annotations

import numpy as np

from .base import (
    bit_width,
    from_unsigned_residuals,
    narrow_residuals,
    pack_sections,
    register,
    split_sections,
)

_FAST_WIDTH_DTYPE = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}
#: little-endian platform → byte-matrix uint32 view fast path in unpack_bits
_LE = np.dtype(np.uint32).byteorder in ("<", "=") and __import__(
    "sys").byteorder == "little"


def _block_k(width: int) -> int:
    """Values per uint64 block for the constant-shift pack/unpack fast path:
    the largest k in {8, 4, 2} whose k×width bits fit one uint64 AND tile
    whole bytes — then k values occupy exactly k*width/8 little-endian bytes
    of the block word, so packing is k constant-shift vector ops on n/k-sized
    arrays instead of per-element variable shifts / n×width bit matrices.
    0 = no block layout (fall back to the general paths)."""
    for k in (8, 4, 2):
        if k * width <= 64 and (k * width) % 8 == 0:
            return k
    return 0


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` (< 2**width) at ``width`` bits, little-endian.

    Byte-level fast path: view each value's low ``ceil(width/8)`` bytes, let
    C-speed ``np.unpackbits``/``np.packbits`` do the bit shuffling — no n×w
    uint64 intermediate (the naive shift-matrix costs ~50x more memory traffic
    and dominated the encode profile before this).

    Accepts uint32 input natively (the int32-column residual fast path —
    widening to uint64 just to throw the high half away doubled the hot
    path's memory traffic); output bytes are identical either way, since a
    value's low ``nb`` little-endian bytes don't depend on its dtype width.
    """
    if width == 0 or len(values) == 0:
        return b""
    if values.dtype != np.uint32 or width > 32:
        values = np.ascontiguousarray(values, dtype=np.uint64)
    else:
        values = np.ascontiguousarray(values)
    if width in _FAST_WIDTH_DTYPE:
        return values.astype(_FAST_WIDTH_DTYPE[width]).tobytes()
    if width in (1, 2, 4):
        # even divisors of 8: k values per output byte — three vectorized
        # passes instead of the n×w bit-matrix shuffle (~10x)
        k = 8 // width
        v = values.astype(np.uint8)
        if len(v) % k:
            v = np.concatenate([v, np.zeros(k - len(v) % k, dtype=np.uint8)])
        v = v.reshape(-1, k)
        out = v[:, 0].copy()
        for j in range(1, k):
            out |= v[:, j] << np.uint8(j * width)
        return out.tobytes()
    bk = _block_k(width) if _LE else 0
    if bk:
        # uint64 block layout: bk values per word at fixed offsets 0, w,
        # 2w, ... — the word's low bk*w/8 little-endian bytes ARE the
        # packed stream, byte-identical to the bit-matrix path (pinned by
        # tests), at ~4x the throughput (constant shifts, no (n, w) matrix)
        n0 = len(values)
        nbb = bk * width // 8
        m = (n0 + bk - 1) // bk
        if n0 != m * bk:
            pad = np.zeros(m * bk, dtype=values.dtype)
            pad[:n0] = values
            values = pad
        v = values.reshape(m, bk)
        word = v[:, 0].astype(np.uint64)
        for j in range(1, bk):
            word |= v[:, j].astype(np.uint64) << np.uint64(j * width)
        out = word.view(np.uint8).reshape(m, 8)[:, :nbb]
        return np.ascontiguousarray(out).tobytes()[: packed_nbytes(n0, width)]
    nb = (width + 7) // 8
    itemsize = values.dtype.itemsize
    le_bytes = values.view(np.uint8).reshape(-1, itemsize)[:, :nb]
    bits = np.unpackbits(le_bytes, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, width: int, n: int, narrow: bool = False) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 (or uint32 when
    ``narrow`` and ``width <= 32`` — the ≤32-bit-column decode fast path,
    halving unpack memory traffic) of length ``n``."""
    narrow = narrow and width <= 32
    out_dtype = np.uint32 if narrow else np.uint64
    if width == 0 or n == 0:
        return np.zeros(n, dtype=out_dtype)
    if width in _FAST_WIDTH_DTYPE:
        return np.frombuffer(
            buf, dtype=_FAST_WIDTH_DTYPE[width], count=n
        ).astype(out_dtype)
    b = np.frombuffer(buf, dtype=np.uint8)
    if width in (1, 2, 4):
        # inverse of pack_bits' even-divisor path: k values per byte
        k = 8 // width
        mask = np.uint8((1 << width) - 1)
        vals = np.empty((len(b), k), dtype=np.uint8)
        for j in range(k):
            vals[:, j] = (b >> np.uint8(j * width)) & mask
        return vals.ravel()[:n].astype(out_dtype)
    bk = _block_k(width) if _LE else 0
    if bk:
        # inverse of pack_bits' uint64 block layout: widen each bk-value
        # byte group to a uint64 word, then bk constant shift+mask ops —
        # no per-element byte gather / variable shifts (~2x less traffic
        # than the 4-byte-window path it replaces for these widths)
        nbb = bk * width // 8
        m = (n + bk - 1) // bk
        need = m * nbb
        if len(b) < need:
            b = np.concatenate([b, np.zeros(need - len(b), dtype=np.uint8)])
        blk = np.zeros((m, 8), dtype=np.uint8)
        blk[:, :nbb] = b[:need].reshape(m, nbb)
        word = blk.view(np.uint64).ravel()
        out = np.empty((m, bk), dtype=out_dtype)
        mask = np.uint64((1 << width) - 1)
        for j in range(bk):
            out[:, j] = (word >> np.uint64(j * width)) & mask
        return out.ravel()[:n]
    if width <= 25:
        # 4-byte little-endian window always covers (bit offset in byte) +
        # width bits — sequential gathers + one shift/mask, ~5x the
        # bit-matrix shuffle on multi-million-value streams
        bitpos = np.arange(n, dtype=np.int64) * width
        byte = bitpos >> 3
        need = int(byte[-1]) + 4 if n else 4
        if len(b) < need:
            b = np.concatenate([b, np.zeros(need - len(b), dtype=np.uint8)])
        if _LE:
            # gather the 4 window bytes into one (n,4) buffer and VIEW it
            # as uint32: same values as the shift/or ladder below, ~60%
            # less temporary-buffer traffic (matters when 32 cores share
            # one memory bus)
            m = np.empty((n, 4), dtype=np.uint8)
            m[:, 0] = b[byte]
            m[:, 1] = b[byte + 1]
            m[:, 2] = b[byte + 2]
            m[:, 3] = b[byte + 3]
            w32 = m.view(np.uint32).ravel()
        else:
            w32 = (
                b[byte].astype(np.uint32)
                | (b[byte + 1].astype(np.uint32) << np.uint32(8))
                | (b[byte + 2].astype(np.uint32) << np.uint32(16))
                | (b[byte + 3].astype(np.uint32) << np.uint32(24))
            )
        vals = (w32 >> (bitpos & 7).astype(np.uint32)) & np.uint32(
            (1 << width) - 1
        )
        return vals if narrow and width <= 32 else vals.astype(np.uint64)
    bits = np.unpackbits(b, count=n * width, bitorder="little").reshape(n, width)
    nb = (width + 7) // 8
    padded = np.zeros((n, nb * 8), dtype=np.uint8)
    padded[:, :width] = bits
    by = np.packbits(padded, axis=1, bitorder="little")  # (n, nb) LE bytes
    out = np.zeros((n, out_dtype(0).nbytes), dtype=np.uint8)
    out[:, :nb] = by
    return out.view(out_dtype).ravel()


def bit_lengths(res: np.ndarray) -> np.ndarray:
    """Per-value bit length of uint64 residuals via ``np.frexp`` — ~10x the
    searchsorted-over-powers-of-two formulation (measured 37ms vs 358ms on
    4M values).

    Exact below 2**53; above, float rounding can overestimate by 1 bit when
    a value rounds up across a power of two.  Every caller uses the result
    only for width/cost decisions (histograms) — encoded bytes stay exact
    regardless, and the honesty guard bounds any misestimate by plain."""
    return np.frexp(res.astype(np.float64))[1].astype(np.int64)


def _bitlen_hist(res: np.ndarray, full: int) -> np.ndarray:
    """``np.bincount(bit_lengths(res), minlength=full + 1)`` computed the
    cheap way: for narrow ranges (``full <= 16``, i.e. values < 65536) a
    value bincount folded through a 2^full bit-length LUT — integer ops
    only, no per-value float64 frexp pass.  Bit-identical histograms either
    way (both use the same frexp bit lengths), pinned by tests."""
    if full <= 16:
        v = res.astype(np.int64, copy=False) if res.dtype == np.uint64 else res
        vb = np.bincount(v, minlength=1 << full)
        counts = np.zeros(full + 1, dtype=np.int64)
        np.add.at(
            counts, bit_lengths(np.arange(1 << full, dtype=np.uint64)),
            vb[: 1 << full],
        )
        return counts
    return np.bincount(bit_lengths(res), minlength=full + 1)


def _fold_bitlen(value_counts: np.ndarray, full: int) -> np.ndarray:
    """Bit-length histogram from an exact VALUE histogram (index = value):
    fold the value counts through the bit-length LUT.  O(len(value_counts))
    integer ops — identical to ``_bitlen_hist`` over the expanded values,
    with no pass over the n values at all."""
    hist = np.zeros(max(full, bit_width(max(len(value_counts) - 1, 0))) + 1,
                    dtype=np.int64)
    np.add.at(
        hist, bit_lengths(np.arange(len(value_counts), dtype=np.uint64)),
        value_counts,
    )
    # entries above ``full`` are zero by construction (full covers the max
    # actual value); the assert catches an inconsistent caller histogram
    # before it could silently change a width decision
    assert int(hist[full + 1:].sum()) == 0, "value_counts exceed 2^full"
    return hist[: full + 1]


def packed_nbytes(n: int, width: int) -> int:
    if width in _FAST_WIDTH_DTYPE:
        return n * (width // 8)
    return (n * width + 7) // 8


@register("int")
class ForBitpack:
    """Frame-of-reference + fixed-width bit-pack (ORC RLEv2-direct analog)."""

    name = "for_bitpack"

    @classmethod
    def encode(cls, arr: np.ndarray) -> tuple[bytes, dict]:
        dtype = str(arr.dtype)
        n = len(arr)
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype, "ref": 0, "width": 0}
        ref = int(arr.min())
        res = narrow_residuals(arr, ref)
        width = bit_width(int(res.max()))
        return pack_bits(res, width), {
            "codec": cls.name,
            "n": n,
            "dtype": dtype,
            "ref": ref,
            "width": width,
        }

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        n = meta["n"]
        if n == 0:
            return np.empty(0, dtype=meta["dtype"])
        narrow = meta["dtype"] in ("int32", "uint32") and meta["width"] <= 32
        res = unpack_bits(payload, meta["width"], n, narrow=narrow)
        return from_unsigned_residuals(res, meta["ref"], meta["dtype"])

    @staticmethod
    def estimate(stats: dict) -> int:
        return packed_nbytes(stats["n"], stats["for_width"])


def encode_int_sub(arr: np.ndarray) -> tuple[bytes, dict]:
    """Encode a sub-stream with the cheaper of ForBitpack / PatchedFor.

    Shared by RLE/delta/dict sub-streams and by PatchedFor's own recursive
    exception encoding (zipfian exception high-bits are themselves skewed)."""
    p1, m1 = ForBitpack.encode(arr)
    p2, m2 = PatchedFor.encode(arr)
    return (p1, m1) if len(p1) <= len(p2) else (p2, m2)


def decode_int_sub(payload: bytes, meta: dict) -> np.ndarray:
    codec = ForBitpack if meta["codec"] == ForBitpack.name else PatchedFor
    return codec.decode(payload, meta)


@register("int")
class PatchedFor:
    """FOR bit-pack with exceptions (ORC RLEv2 patched-base analog).

    Base stream holds the low ``w`` bits of every residual; exceptions (rows
    whose residual needs > ``w`` bits) store their high bits in a side section,
    with positions as either bit-packed indices (sparse exceptions) or a
    1-bit-per-row bitmap (dense exceptions — e.g. zipfian token ids, where
    ~half the values exceed any narrow width and index lists would dwarf the
    win).  ``w`` and the position representation are chosen by exact cost
    minimization over the residual bit-length histogram — the explicit,
    observable version of the ORC writer's internal heuristic (SURVEY.md §4.2).
    On zipf(1.1) token ids this reaches ~13.3 bits/token vs 16 for flat
    bit-packing and ~23 for ORC-default (measured).
    """

    name = "patched_for"

    @staticmethod
    def best_width_from_hist(counts: np.ndarray, n: int, full: int) -> tuple[int, int]:
        """(w, cost_bytes) minimizing exact cost given a bit-length histogram.

        The histogram may be scaled up from a sample (selector path) — the
        cost formula only needs counts, so sampled selection and exact encode
        share this code.
        """
        n_exc_ge = np.concatenate([np.cumsum(counts[::-1])[::-1][1:], [0]])
        pos_w = bit_width(max(n - 1, 0))
        bitmap_cost = (n + 7) // 8
        costs = {full: packed_nbytes(n, full)}
        for w in range(full):
            n_exc = int(n_exc_ge[w]) if w < len(n_exc_ge) else 0
            pos_cost = min(packed_nbytes(n_exc, pos_w), bitmap_cost)
            costs[w] = (
                packed_nbytes(n, w)
                + pos_cost
                + packed_nbytes(n_exc, full - w)
                + 16
            )
        best_cost = min(costs.values())
        # speed-aware tie-break: within 2% of optimal, prefer widths whose
        # base AND exception streams are byte-aligned (pure astype pack,
        # ~10x faster than bit shuffling) — on zipfian tokens this picks
        # w=8 over w=6 for +0.1 bits/token and a large throughput win.
        tol = best_cost * 1.02 + 8
        def aligned(w):
            return (w % 8 == 0 or w == 0) and ((full - w) % 8 == 0)
        candidates = sorted(
            (w for w, c in costs.items() if c <= tol),
            key=lambda w: (not aligned(w), costs[w], w),
        )
        best_w = candidates[0]
        return best_w, costs[best_w]

    @classmethod
    def _best_width(cls, res: np.ndarray, n: int) -> tuple[int, int, np.ndarray]:
        """Return (w, cost_bytes, bitlen_counts) minimizing exact cost."""
        full = bit_width(int(res.max())) if n else 0
        counts = _bitlen_hist(res, full)
        w, cost = cls.best_width_from_hist(counts, n, full)
        return w, cost, counts

    @classmethod
    def encode(cls, arr: np.ndarray, width_hint: int | None = None,
               base_recurse: bool = True,
               value_counts: np.ndarray | None = None) -> tuple[bytes, dict]:
        """``value_counts`` (optional) is the EXACT histogram of ``arr``'s
        values (index = value; requires non-negative values): when a caller
        already knows the value distribution — the dictionary path's
        counts-by-rank, or a parent level's derived base/hi histograms —
        every width search and recursion gate folds that card-sized
        histogram instead of re-scanning the n values.  Decisions (and
        payload bytes) are provably identical either way."""
        dtype = str(arr.dtype)
        n = len(arr)
        if n == 0:
            return b"", {"codec": cls.name, "n": 0, "dtype": dtype, "ref": 0,
                         "width": 0, "full_width": 0, "n_exc": 0, "sections": []}
        ref = int(arr.min())
        res = narrow_residuals(arr, ref)
        one = res.dtype.type  # dtype-local scalars keep uint32 ops uint32
        full = bit_width(int(res.max()))
        vc = None
        if value_counts is not None and ref >= 0:
            # residual value x occurs vc[x] times (shift by the reference)
            vc = value_counts[ref:] if ref else value_counts
        counts = _fold_bitlen(vc, full) if vc is not None else None
        if width_hint is not None and width_hint <= full:
            w = width_hint  # selector-sampled choice; cost deviation is tiny
        elif counts is not None:
            w, _ = cls.best_width_from_hist(counts, n, full)
        else:
            w, _, counts = cls._best_width(res, n)
        mask = one((1 << w) - 1) if w else one(0)
        base = res & mask
        exc_mask = res > mask
        n_exc = int(np.count_nonzero(exc_mask))
        pos_w = bit_width(max(n - 1, 0))
        use_bitmap = (n + 7) // 8 < packed_nbytes(n_exc, pos_w)
        if use_bitmap:
            # bitmap positions never need the index list — boolean-mask
            # extraction of the exception values skips materializing (and
            # re-reading) an 8-byte-per-exception index array
            pos_section = np.packbits(exc_mask, bitorder="little").tobytes()
            hi_vals = res[exc_mask] >> one(w)
        else:
            exc_idx = np.flatnonzero(exc_mask)
            pos_section = pack_bits(exc_idx.astype(np.uint64), pos_w)
            hi_vals = res[exc_idx] >> one(w)
        hi_meta = None
        hi_section = None
        # recursive exception encoding — only when the high-bits histogram
        # says it wins ≥5% (on zipf tails each octave is near-uniform and
        # flat is already optimal; recursing anyway cost 4x encode time for
        # zero bytes, measured)
        if 0 < w and full - w < 63 and n_exc >= 4096:
            hi_full = full - w
            if counts is not None:
                # bitlen(r >> w) == bitlen(r) - w for every exception value
                # (their bit lengths exceed w), so the hi histogram is the
                # width search's residual histogram shifted by w — the gate
                # costs nothing instead of a second pass over the values
                hi_counts = np.zeros(hi_full + 1, dtype=np.int64)
                hi_counts[1:] = counts[w + 1: full + 1]
            else:
                hi_counts = _bitlen_hist(hi_vals, hi_full)
            _, est = cls.best_width_from_hist(hi_counts, n_exc, hi_full)
            flat_cost = packed_nbytes(n_exc, hi_full)
            if est < flat_cost * 0.95:
                hi_vc = None
                if vc is not None and hi_full <= 20:
                    # value histogram of the hi stream: residual j > mask
                    # contributes its count to value j >> w
                    hi_vc = np.zeros(1 << hi_full, dtype=np.int64)
                    np.add.at(
                        hi_vc,
                        np.arange(int(mask) + 1, len(vc), dtype=np.int64) >> w,
                        vc[int(mask) + 1:],
                    )
                # native (often uint32) dtype — the int64 copy the old code
                # paid here doubled the sub-encode's memory traffic for
                # byte-identical payload output; only the recorded meta
                # dtype string changes, which decode dispatches on anyway
                hi_section, hi_meta = cls.encode(hi_vals, value_counts=hi_vc)
        if hi_section is None:
            hi_section = pack_bits(hi_vals, full - w)
        # recursive BASE encoding (round 4): the base stream flat-packs every
        # value at w bits, but on skewed data the NON-exception values are
        # themselves concentrated near 0 (zipfian rank codes: most are 0/1/2)
        # — re-running patched-FOR on the base stream recovers ~0.4 bits/val
        # of that slack (8.44 → 8.04 on the bench rank codes).  Gated the
        # same way as the hi recursion: a histogram estimate must promise
        # ≥5% before paying the extra pass, and the exact size must confirm.
        # ONE level only (the inner call may not recurse its own base), and
        # skipped entirely under the "speed" selection policy (base.py
        # SPEED_MODE) — this is an explicit CPU-for-bytes trade reserved for
        # the size-argmin contract.
        from .base import speed_mode

        base_section = None
        base_meta = None
        if base_recurse and not speed_mode() and w > 1 and n >= 65536:
            b_vc = None
            if vc is not None and w <= 20:
                # value histogram of the base stream: value j contributes
                # its count to j & mask — card-sized, no pass over base
                b_vc = np.zeros(1 << w, dtype=np.int64)
                np.add.at(
                    b_vc,
                    np.arange(len(vc), dtype=np.int64) & int(mask),
                    vc,
                )
                b_counts = _fold_bitlen(b_vc, w)
            else:
                # base < 2^w: _bitlen_hist's value-bincount path (O(n+2^w),
                # int ops) beats a frexp bit-length pass over n floats
                b_counts = _bitlen_hist(base, w)
            b_w, b_est = cls.best_width_from_hist(b_counts, n, w)
            flat_cost = packed_nbytes(n, w)
            if b_est < flat_cost * 0.95:
                # width_hint reuses the gate's exact histogram, and the base
                # stream keeps its native (often uint32) dtype — the inner
                # encode runs the narrow fast paths with no int64 copy
                cand, cand_meta = cls.encode(
                    base, width_hint=b_w, base_recurse=False,
                    value_counts=b_vc,
                )
                if len(cand) < flat_cost:
                    base_section, base_meta = cand, cand_meta
        if base_section is None:
            base_section = pack_bits(base, w)
        payload, sections = pack_sections(base_section, pos_section, hi_section)
        return payload, {
            "codec": cls.name, "n": n, "dtype": dtype, "ref": ref,
            "width": w, "full_width": full, "pos_width": pos_w,
            "pos_kind": "bitmap" if use_bitmap else "indices",
            "n_exc": n_exc, "sections": sections,
            "hi": hi_meta, "base": base_meta,
        }

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> np.ndarray:
        n = meta["n"]
        if n == 0:
            return np.empty(0, dtype=meta["dtype"])
        base_b, pos_b, hi_b = split_sections(payload, meta["sections"])
        narrow = (
            meta["dtype"] in ("int32", "uint32") and meta["full_width"] <= 32
        )
        if meta.get("base"):
            dec = decode_int_sub(base_b, meta["base"])
            res = dec.astype(np.uint32 if narrow else np.uint64, copy=False)
        else:
            res = unpack_bits(base_b, meta["width"], n, narrow=narrow)
        n_exc = meta["n_exc"]
        if n_exc:
            if meta.get("pos_kind") == "bitmap":
                # density-adaptive bitmap scan.  The encoder picks bitmap
                # when exceptions are MODERATELY DENSE (> n/pos_width), but
                # the distribution varies per chunk: when few BYTES hold a
                # set bit, unpack only those (O(set bytes) instead of
                # unpackbits(n) + flatnonzero(n), ~5x); past ~1/8 of bytes
                # the dense path's sequential scans win.
                pb = np.frombuffer(pos_b, dtype=np.uint8)
                nz_bytes = np.flatnonzero(pb)
                if len(nz_bytes) == 0:
                    idx = np.empty(0, dtype=np.int64)
                elif len(nz_bytes) * 8 <= len(pb):
                    bits8 = np.unpackbits(
                        pb[nz_bytes], bitorder="little"
                    ).reshape(-1, 8)
                    rows, cols = np.nonzero(bits8)
                    # row-major nonzero → ascending positions, same order
                    # the dense flatnonzero produces
                    idx = nz_bytes[rows] * 8 + cols
                else:
                    bits = np.unpackbits(pb, count=n, bitorder="little")
                    # bool view: numpy's nonzero fast path (~26% over uint8)
                    idx = np.flatnonzero(bits.view(np.bool_))
            else:
                idx = unpack_bits(pos_b, meta["pos_width"], n_exc).astype(np.int64)
            if meta.get("hi"):
                hi = decode_int_sub(hi_b, meta["hi"])
            else:
                hi = unpack_bits(
                    hi_b, meta["full_width"] - meta["width"], n_exc,
                    narrow=narrow,
                )
            if narrow:
                res[idx] |= hi.astype(np.uint32, copy=False) << np.uint32(
                    meta["width"]
                )
            else:
                if hi.dtype != np.uint64:
                    hi = hi.astype(np.int64, copy=False).view(np.uint64)
                res[idx] |= hi << np.uint64(meta["width"])
        return from_unsigned_residuals(res, meta["ref"], meta["dtype"])

    @staticmethod
    def estimate(stats: dict) -> int:
        return stats["patched_cost"]

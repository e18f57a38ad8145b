"""FSST-style string compression (Boncz, Neumann, Leis — VLDB 2020).

Random-access string compression via a table of ≤254 frequent substrings
(symbols, 2–8 bytes).  Replaces ORC's generic zlib-on-strings with a
lightweight codec, per the engine's north rule.  Public-paper algorithm only;
the reference repo contains no string encoder (it delegates to orc-core,
reference `project.clj:9`).

Everything is vectorized numpy — no per-byte Python loop:

* **Symbol table build** (on a bounded sample): for each length *l* in 2..8,
  pack all sliding windows into uint64 keys (8 shift-OR passes, O(n) each),
  count with ``np.unique``, rank candidates by gain ``count × (l-1)``.
* **Longest-match table**: for each position, match windows against the
  per-length sorted symbol keys via ``np.searchsorted``; take the longest.
* **Greedy left-to-right scan** = walking the functional graph
  ``next(i) = i + match_len(i)`` from position 0.  Enumerated in
  O(log n) vectorized rounds with pointer doubling: with ``J_k`` the
  2^k-step jump table, the visited set satisfies
  ``S_{k+1} = S_k ∪ J_k[S_k]`` (binary decomposition of path distances).
* **Decode**: codes → per-code output lengths → cumsum offsets → one
  vectorized gather from the symbol blob; code 255 marks a literal byte
  drawn in order from a separate literals section (keeps decode branch-free,
  unlike inline escape bytes).
"""

from __future__ import annotations

import numpy as np

from .base import StringCol, pack_sections, register, split_sections
from .delta import Delta

LITERAL = 255
MAX_SYMBOLS = 254
MIN_LEN, MAX_LEN = 2, 8
SAMPLE_BYTES = 1 << 16
MIN_COUNT = 4  # a substring must repeat this often in the sample to qualify


def _window_keys(data: np.ndarray, length: int) -> np.ndarray:
    """uint64 key of every ``length``-byte window (little-endian packed)."""
    n = len(data) - length + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    keys = np.zeros(n, dtype=np.uint64)
    d = data.astype(np.uint64)
    for j in range(length):
        keys |= d[j : j + n] << np.uint64(8 * j)
    return keys


def build_symbol_table(sample: np.ndarray) -> list[bytes]:
    """Pick ≤254 high-gain substrings (2–8 bytes) from a byte sample."""
    candidates: list[tuple[int, int, int]] = []  # (gain, length, key)
    for length in range(MIN_LEN, MAX_LEN + 1):
        keys = _window_keys(sample, length)
        if len(keys) == 0:
            continue
        vals, counts = np.unique(keys, return_counts=True)
        good = counts >= MIN_COUNT
        for v, c in zip(vals[good], counts[good]):
            candidates.append((int(c) * (length - 1), length, int(v)))
    candidates.sort(key=lambda t: (-t[0], t[1], t[2]))
    symbols = []
    seen = set()
    for gain, length, key in candidates[: MAX_SYMBOLS * 4]:
        sym = int(key).to_bytes(8, "little")[:length]
        if sym in seen:
            continue
        seen.add(sym)
        symbols.append(sym)
        if len(symbols) >= MAX_SYMBOLS:
            break
    return symbols


def _match_tables(symbols: list[bytes]):
    """Per-length (sorted_keys, code_ids) lookup tables."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for length in range(MIN_LEN, MAX_LEN + 1):
        entries = [(int.from_bytes(s.ljust(8, b"\0"), "little"), code)
                   for code, s in enumerate(symbols) if len(s) == length]
        if not entries:
            continue
        entries.sort()
        keys = np.array([e[0] for e in entries], dtype=np.uint64)
        codes = np.array([e[1] for e in entries], dtype=np.int64)
        by_len[length] = (keys, codes)
    return by_len


def _greedy_visit(step: np.ndarray) -> np.ndarray:
    """Positions visited by the greedy scan i -> i + step[i], from 0.

    Pointer-doubling set construction; O(n log n) vectorized.
    """
    n = len(step)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    jump = np.empty(n + 1, dtype=np.int64)
    jump[:n] = np.minimum(np.arange(n, dtype=np.int64) + step, n)
    jump[n] = n
    visited = np.zeros(n + 1, dtype=bool)
    visited[0] = True
    frontier = np.array([0], dtype=np.int64)
    levels = max(1, int(np.ceil(np.log2(n + 1))))
    for _ in range(levels):
        cur = np.flatnonzero(visited)
        nxt = jump[cur]
        new = nxt[~visited[nxt]]
        if len(new):
            visited[new] = True
        jump = jump[jump]
    return np.flatnonzero(visited[:n])


@register("str")
class Fsst:
    name = "fsst"

    @classmethod
    def encode(cls, col: StringCol,
               symbols: list[bytes] | None = None) -> tuple[bytes, dict]:
        """``symbols`` lets a caller reuse a symbol table built on an earlier
        chunk of the same column (the per-partition cache in the encode
        pipeline) — table construction dominates FSST encode time, the table
        travels in each chunk's meta regardless, and the honesty guard
        bounds any staleness by plain."""
        n = col.n
        data = np.frombuffer(col.data, dtype=np.uint8)
        op, om = Delta.encode(col.offsets)
        if len(data) == 0:
            payload, sections = pack_sections(b"", b"", b"", op)
            return payload, {"codec": cls.name, "n": n, "data_len": 0,
                             "sections": sections, "offsets": om, "symbols": None}
        if symbols is None:
            symbols = build_symbol_table(data[:SAMPLE_BYTES])
        codes_out, literals = cls._compress(data, symbols)
        from .plain import PlainStr

        sp, sm = PlainStr.encode(StringCol.from_list(symbols))
        payload, sections = pack_sections(sp, codes_out.tobytes(),
                                          literals.tobytes(), op)
        return payload, {"codec": cls.name, "n": n, "data_len": int(len(data)),
                         "sections": sections, "offsets": om, "symbols": sm,
                         "n_codes": int(len(codes_out))}

    @staticmethod
    def _compress(data: np.ndarray, symbols: list[bytes]):
        nb = len(data)
        match_len = np.ones(nb, dtype=np.int64)
        match_code = np.full(nb, LITERAL, dtype=np.uint8)
        for length, (keys, code_ids) in _match_tables(symbols).items():
            wk = _window_keys(data, length)
            idx = np.searchsorted(keys, wk)
            idx_c = np.minimum(idx, len(keys) - 1)
            hit = keys[idx_c] == wk
            # longest match wins: only overwrite shorter previous matches
            upd = hit & (match_len[: len(wk)] < length)
            match_len[: len(wk)][upd] = length
            match_code[: len(wk)][upd] = code_ids[idx_c[upd]].astype(np.uint8)
        visited = _greedy_visit(match_len)
        codes_out = match_code[visited]
        literals = data[visited[codes_out == LITERAL]]
        return codes_out, literals

    @classmethod
    def decode(cls, payload: bytes, meta: dict) -> StringCol:
        sp, cb, lb, op = split_sections(payload, meta["sections"])
        offsets = Delta.decode(op, meta["offsets"])
        if meta["data_len"] == 0:
            return StringCol(b"", offsets)
        from .plain import PlainStr

        sym_col = PlainStr.decode(sp, meta["symbols"])
        codes = np.frombuffer(cb, dtype=np.uint8)
        literals = np.frombuffer(lb, dtype=np.uint8)
        # per-code output length (literal -> 1)
        sym_off = sym_col.offsets
        lens_table = np.ones(256, dtype=np.int64)
        nsym = sym_col.n
        lens_table[:nsym] = sym_off[1:] - sym_off[:-1]
        out_lens = lens_table[codes]
        out_off = np.zeros(len(codes) + 1, dtype=np.int64)
        np.cumsum(out_lens, out=out_off[1:])
        total = int(out_off[-1])
        out = np.empty(total, dtype=np.uint8)
        sym_data = np.frombuffer(sym_col.data, dtype=np.uint8)
        is_sym = codes < nsym
        if is_sym.any():
            sidx = np.flatnonzero(is_sym)
            slens = out_lens[sidx]
            # vectorized within-row position: global arange minus each row's start
            starts_rep = np.repeat(out_off[sidx], slens)
            total_sym = int(slens.sum())
            gpos = np.arange(total_sym, dtype=np.int64)
            row_start_rep = np.repeat(np.concatenate([[0], np.cumsum(slens)])[:-1], slens)
            within = gpos - row_start_rep
            src = np.repeat(sym_off[:-1][codes[sidx]], slens) + within
            out[starts_rep + within] = sym_data[src]
        lit_idx = np.flatnonzero(~is_sym)
        if len(lit_idx):
            out[out_off[lit_idx]] = literals[: len(lit_idx)]
        return StringCol(out.tobytes(), offsets)

    @staticmethod
    def estimate(stats: dict) -> int | None:
        return stats.get("fsst_est")

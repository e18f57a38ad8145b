"""Per-chunk codec auto-selection: stats pass → size estimate → argmin.

The ORC writer picks dictionary-vs-direct by a distinct-ratio threshold and an
RLEv2 sub-mode per 512-value run — internal, unobservable heuristics
(SURVEY.md §4.2; the reference merely configures that writer,
`test/orc/fixture.clj:25-27`).  This module makes the decision **explicit and
recorded**: one vectorized stats pass per column chunk, closed-form encoded
sizes per candidate codec (exact for the int kernels given the stats), argmin,
and a selection record that lands in the manifest sidecar so every choice is
auditable.

Honesty guard: if the winner's *actual* payload comes out larger than the
plain encoding, we fall back to plain — the selector can be wrong only in the
direction of a recorded, bounded regret.
"""

from __future__ import annotations

import numpy as np

from .kernels import INT_CODECS, STR_CODECS, StringCol
from .kernels.base import bit_width
from .kernels.bitpack import ForBitpack, PatchedFor, packed_nbytes
from .kernels.dict_ import DictInt, DictStr
from .kernels.delta import Delta
from .kernels.fsst import Fsst
from .kernels.plain import PlainInt, PlainStr
from .kernels.rle import Rle, run_starts

DISTINCT_SAMPLE = 1 << 16
FSST_SAMPLE_STRINGS = 2048


def int_stats(arr: np.ndarray) -> dict:
    """One pass of cheap exact statistics for closed-form size estimates."""
    n = len(arr)
    itemsize = arr.dtype.itemsize
    if n == 0:
        return {"n": 0, "itemsize": itemsize, "for_width": 0, "delta_width": 0,
                "n_runs": 0, "run_len_width": 0, "n_distinct": 0,
                "patched_cost": 0}
    a64 = arr.astype(np.int64, copy=False)
    lo, hi = int(a64.min()), int(a64.max())
    res = (a64.view(np.uint64) - np.int64(lo).view(np.uint64))
    for_width = bit_width(int(res.max()))

    d = (a64[1:].view(np.uint64) - a64[:-1].view(np.uint64)).view(np.int64)
    if len(d):
        dlo = int(d.min())
        dres = (d.view(np.uint64) - np.int64(dlo).view(np.uint64))
        delta_width = bit_width(int(dres.max()))
    else:
        delta_width = 0

    starts = run_starts(a64)
    n_runs = len(starts)
    max_run = int(np.diff(np.concatenate([starts, [n]])).max()) if n_runs else 0
    run_len_width = bit_width(max_run)

    if n <= DISTINCT_SAMPLE * 4:
        n_distinct = len(np.unique(a64))
        distinct_exact = True
    else:
        sample = a64[:: max(1, n // DISTINCT_SAMPLE)]
        n_distinct = len(np.unique(sample))  # lower bound — biases against dict
        distinct_exact = False

    _, patched_cost, _ = PatchedFor._best_width(res, n)

    return {
        "n": n, "itemsize": itemsize, "min": lo, "max": hi,
        "for_width": for_width, "delta_width": delta_width,
        "n_runs": n_runs, "run_len_width": run_len_width,
        "n_distinct": n_distinct, "distinct_exact": distinct_exact,
        "patched_cost": patched_cost,
    }


def str_stats(col: StringCol) -> dict:
    n = col.n
    data_bytes = len(col.data)
    stats = {"n": n, "data_bytes": data_bytes, "n_distinct": 0,
             "distinct_bytes": 0, "fsst_est": None}
    if n == 0:
        return stats
    import pandas as pd

    sample_n = min(n, DISTINCT_SAMPLE)
    step = max(1, n // sample_n)
    idx = np.arange(0, n, step)
    lens = col.offsets[1:] - col.offsets[:-1]
    sample_rows = [col.row(int(i)) for i in idx]
    codes, uniques = pd.factorize(pd.Series(sample_rows))
    card_ratio = len(uniques) / len(idx)
    stats["n_distinct"] = max(len(uniques), int(card_ratio * n) if card_ratio > 0.5 else len(uniques))
    avg_len = data_bytes / n
    stats["distinct_bytes"] = int(stats["n_distinct"] * avg_len)

    # FSST estimate: actually encode a bounded sample and extrapolate
    k = min(n, FSST_SAMPLE_STRINGS)
    head = StringCol(
        bytes(col.data[: col.offsets[k]]), col.offsets[: k + 1].copy()
    )
    if len(head.data) > 0:
        payload, _ = Fsst.encode(head)
        ratio = len(payload) / max(1, len(head.data) + 2 * k)
        stats["fsst_est"] = int(ratio * (data_bytes + 2 * n)) + 64
    return stats


INT_CANDIDATES = (PlainInt, ForBitpack, PatchedFor, Rle, Delta, DictInt)
STR_CANDIDATES = (PlainStr, DictStr, Fsst)


def select_int(arr: np.ndarray) -> tuple[str, dict]:
    stats = int_stats(arr)
    if stats["n"] == 0:
        return PlainInt.name, {}
    ests = {}
    for codec in INT_CANDIDATES:
        if codec is Delta:
            ests[codec.name] = Delta.estimate(stats)
        elif codec is DictInt:
            # dict pays the dictionary; only sensible when card << n
            if stats["n_distinct"] < stats["n"] // 2:
                ests[codec.name] = DictInt.estimate(stats)
        else:
            ests[codec.name] = codec.estimate(stats)
    winner = min(ests, key=ests.get)
    return winner, ests


def select_str(col: StringCol) -> tuple[str, dict]:
    stats = str_stats(col)
    if stats["n"] == 0:
        return PlainStr.name, {}
    ests = {PlainStr.name: PlainStr.estimate(stats)}
    if stats["n_distinct"] < stats["n"] // 2:
        ests[DictStr.name] = DictStr.estimate(stats)
    if stats["fsst_est"] is not None:
        ests[Fsst.name] = stats["fsst_est"]
    winner = min(ests, key=ests.get)
    return winner, ests


def encode_column(column, kind: str) -> tuple[bytes, dict, dict]:
    """Select, encode, and guard: returns (payload, meta, selection_record)."""
    if kind == "int":
        winner, ests = select_int(column)
        payload, meta = INT_CODECS[winner].encode(column)
        plain_size = column.nbytes
        if len(payload) > plain_size:
            payload, meta = PlainInt.encode(column)
            winner = PlainInt.name
    else:
        winner, ests = select_str(column)
        payload, meta = STR_CODECS[winner].encode(column)
        plain_size = len(column.data) + 8 * column.n
        if len(payload) > plain_size + 64:
            payload, meta = PlainStr.encode(column)
            winner = PlainStr.name
    selection = {
        "codec": winner,
        "estimates": {k: int(v) for k, v in ests.items()},
        "actual_bytes": len(payload),
    }
    return payload, meta, selection

"""Aggregate memory-bandwidth probe — the mechanism behind the 8->32 plateau.

The encode job is a streaming columnar workload: parquet decompress + numpy
kernel passes, i.e. bytes moved per token dominate.  If the machine's
aggregate DRAM bandwidth saturates below 32 threads, NO job of this class
can scale 8->32 at >=0.8 on this box — Spark or not.  This probe measures
exactly that ceiling with zero Spark involvement: T threads each stream-copy
a private buffer far larger than LLC (numpy copyto releases the GIL), and we
report aggregate GB/s per thread count.

Usage: python scripts/membw_probe.py [--mb 256] [--secs 3] [--levels 1,2,8,32]
Prints one JSON line per level plus a summary with the 8->32 bandwidth ratio.
"""
import argparse
import json
import os
import threading
import time

import numpy as np


def _worker(buf_mb: int, barrier: threading.Barrier, stop: list,
            counter: list, idx: int) -> None:
    a = np.empty(buf_mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    a[:] = idx  # touch pages
    np.copyto(b, a)  # touch destination pages too (no faults in the loop)
    barrier.wait()  # timing starts only after EVERY thread is warm
    n = 0
    while not stop[0]:
        np.copyto(b, a)
        n += 1
    counter[idx] = n


def measure(threads: int, buf_mb: int, secs: float) -> dict:
    stop = [False]
    counter = [0] * threads
    barrier = threading.Barrier(threads + 1)
    ts = [
        threading.Thread(
            target=_worker, args=(buf_mb, barrier, stop, counter, i)
        )
        for i in range(threads)
    ]
    for t in ts:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    time.sleep(secs)
    stop[0] = True
    for t in ts:
        t.join()
    wall = time.monotonic() - t0
    # copyto reads + writes the buffer: 2 * buf bytes per iteration
    gb = sum(counter) * buf_mb * 2 / 1024
    return {
        "threads": threads,
        "agg_gb_per_sec": round(gb / wall, 2),
        "iters": sum(counter),
        "wall_sec": round(wall, 2),
        "loadavg": os.getloadavg(),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--levels", default="1,2,8,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    best: dict[int, float] = {}
    for rep in range(args.reps):
        for lv in levels:  # interleaved so neighbor noise hits all levels
            r = measure(lv, args.mb, args.secs)
            r["rep"] = rep
            print("MEMBW " + json.dumps(r), flush=True)
            best[lv] = max(best.get(lv, 0.0), r["agg_gb_per_sec"])
    summary = {"best_agg_gb_per_sec": {str(k): v for k, v in best.items()}}
    for a, b in ((2, 8), (8, 32)):
        if a in best and b in best and best[a]:
            summary[f"bw_ratio_{a}to{b}"] = round(best[b] / best[a], 3)
            summary[f"max_possible_eff_{a}to{b}"] = round(
                best[b] / best[a] / (b // a), 3
            )
    print("MEMBW_SUMMARY " + json.dumps(summary))

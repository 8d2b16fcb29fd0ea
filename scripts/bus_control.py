"""Spark-free control experiment for BENCH.md's single-box memory-bus
caveat: measure how three workload classes scale 1 -> 32 OS processes on
this host, with zero Spark involvement (pure multiprocessing).

  pycpu   pure-Python arithmetic loop (no memory traffic): the ceiling any
          CPU-bound work can reach on this box.
  gather  numpy fancy-indexed gather over a 256 MiB table (the DINT decode
          kernel's memory-access pattern: table2d[codes] + scatter).
  decode  the engine's real decode_list_bulk over a prepared DINT-encoded
          posting list (mixed: python orchestration + numpy gather).

Each worker runs its workload in a loop for WALL seconds; throughput is
summed ops across workers / wall. Per-core efficiency at level P =
(throughput_P / throughput_1) / P. Prints one markdown table.

Usage: python scripts/bus_control.py [wall_seconds]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = [1, 2, 4, 8, 16, 32]
WALL = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0


def _w_pycpu(q, wall):
    t0 = time.perf_counter()
    ops = 0
    x = 1
    while time.perf_counter() - t0 < wall:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) % 2147483648
        ops += 10000
    q.put(ops)


def _w_gather(q, wall):
    rng = np.random.default_rng(os.getpid())
    table = rng.integers(0, 2**32, size=(2**22, 8), dtype=np.uint32)  # 128MiB
    codes = rng.integers(0, 2**22, size=2**20).astype(np.int64)
    t0 = time.perf_counter()
    ops = 0
    while time.perf_counter() - t0 < wall:
        out = table[codes]  # (2^20, 8) gather = 32 MiB materialized
        ops += out.size
    q.put(ops)


def _w_decode(q, wall):
    from dint_spark.dint.codec import decode_list_bulk, encode_list
    from dint_spark.dint.dictionary import DintDictionary, select_patterns_dsf

    rng = np.random.default_rng(7)
    n = 200_000
    docs = np.sort(rng.choice(np.arange(4 * n), size=n, replace=False))
    freqs = rng.integers(1, 16, size=n)
    # quick dict from this list's own gap stats
    gaps = np.diff(docs, prepend=-1) - 1
    stats = {}
    for s in (16, 8, 4, 2, 1):
        for off in range(0, (len(gaps) // s) * s, s):
            pat = gaps[off: off + s].astype("<u4").tobytes()
            stats[(pat, s)] = stats.get((pat, s), 0) + 1
    dd = DintDictionary.build(select_patterns_dsf(
        [(p, s, f) for (p, s), f in stats.items()], len(gaps)))
    fstats = {}
    fvals = (freqs - 1).astype("<u4")
    for s in (16, 8, 4, 2, 1):
        for off in range(0, (len(fvals) // s) * s, s):
            pat = fvals[off: off + s].tobytes()
            fstats[(pat, s)] = fstats.get((pat, s), 0) + 1
    fd = DintDictionary.build(select_patterns_dsf(
        [(p, s, f) for (p, s), f in fstats.items()], len(fvals)))
    payload, bmax, endp, foff = encode_list(docs, freqs, dd, fd)
    t0 = time.perf_counter()
    ints = 0
    while time.perf_counter() - t0 < wall:
        decode_list_bulk(payload, n, bmax, endp, foff, dd, fd)
        ints += 2 * n
    q.put(ints)


def run_level(fn, procs: int, wall: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, wall)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    elapsed = time.perf_counter() - t0
    return total / elapsed


def main() -> None:
    mp.set_start_method("fork", force=True)
    workloads = [("pycpu", _w_pycpu), ("gather", _w_gather),
                 ("decode", _w_decode)]
    results = {}
    for name, fn in workloads:
        per = []
        for p in LEVELS:
            thr = run_level(fn, p, WALL)
            per.append(thr)
        results[name] = per
        sys.stderr.write(f"{name} done\n")
    hdr = " | ".join(f"{p}p" for p in LEVELS)
    print(f"| workload | {hdr} | eff 8->32 |")
    print("|---|" + "---|" * (len(LEVELS) + 1))
    for name, per in results.items():
        base = per[0]
        cells = " | ".join(
            f"{thr/base:.1f}x ({(thr/base)/p:.2f})" for p, thr in zip(LEVELS, per))
        i8, i32 = LEVELS.index(8), LEVELS.index(32)
        eff = (per[i32] / per[i8]) / (32 / 8)
        print(f"| {name} | {cells} | {eff:.2f} |")
    print("\n(cells: speedup over 1 process (per-core efficiency); "
          f"wall {WALL:.0f}s per level)")


if __name__ == "__main__":
    main()

"""Single-core A/B of the pattern-stats collector on REAL postings.

Usage: python scripts/stats_ab.py <index_dir> [runs]

Loads <index_dir>/postings.parquet with pyarrow (no Spark), then times the
in-task collector path (_collect_stream + _merge_pending + _compact_acc +
pattern emission) end-to-end, best-of-N, in both single and per-block
(multi-dict) modes. Compare across commits to quantify collector changes
(e.g. the u64 window packing for sizes 4/8/16) free of Spark job noise.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.dataset as ds

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dint_spark.dint import stats as S  # noqa: E402


def load_lists(index_dir: str):
    data = ds.dataset(f"{index_dir}/postings.parquet").to_table(
        columns=["doc_ids", "freqs"])
    docs = data["doc_ids"].to_pylist()
    freqs = data["freqs"].to_pylist()
    return [(np.asarray(d, dtype=np.int64), np.asarray(f, dtype=np.int64))
            for d, f in zip(docs, freqs)]


def run_collector(lists, per_block: bool) -> tuple[float, int]:
    t0 = time.time()
    acc_d: dict = {}
    acc_f: dict = {}
    pend_d: dict = {}
    pend_f: dict = {}
    n = 0
    for i, (docs, fr) in enumerate(lists):
        gaps = np.diff(docs, prepend=-1) - 1
        S._collect_stream(gaps.astype(np.uint32), pend_d, per_block)
        S._collect_stream((fr - 1).astype(np.uint32), pend_f, per_block)
        if i % 2048 == 2047:  # batch boundary, like the Arrow loop
            n += S._merge_pending(pend_d, acc_d)
            n += S._merge_pending(pend_f, acc_f)
    S._merge_pending(pend_d, acc_d)
    S._merge_pending(pend_f, acc_f)
    rows = 0
    for acc in (acc_d, acc_f):
        S._compact_acc(acc)
        for sel, s, ub, counts in S._iter_pattern_groups(acc):
            w = 4 * s
            rows += len([ub[i * w: i * w + w] for i in range(len(counts))])
    return time.time() - t0, rows


def main() -> None:
    index_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dint_phasewalls"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lists = load_lists(index_dir)
    total = sum(len(d) for d, _ in lists)
    print(f"{len(lists)} lists, {total} postings "
          f"({2 * total} ints through the collector)")
    for per_block in (False, True):
        best, rows = min(
            (run_collector(lists, per_block) for _ in range(runs)),
            key=lambda t: t[0])
        print(f"per_block={per_block}: best-of-{runs} {best:.3f}s "
              f"({2 * total / best / 1e6:.2f} M ints/s/core, "
              f"{rows} distinct patterns)")


if __name__ == "__main__":
    main()

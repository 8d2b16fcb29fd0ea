"""HyperLogLog cardinality sketch (events_cardinality):

  - the estimate derived from the gate's integer invariant is within
    HLL's published error envelope (sigma = 1.04/sqrt(m) = 3.25% at
    m=1024) on known-cardinality sets, including the linear-counting
    small-range regime;
  - sketches MERGE by register max: sketch(A ∪ B) == merge(sketch(A),
    sketch(B)) exactly — the property that makes the op shard/epoch
    composable at scale.

Pure-Python replica of the exact md5/register math the Spark op and the
DuckDB oracle both compute (dint_spark/ops/events.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

from dint_spark.ops.events import HLL_M, HLL_P, _HLL_W_BITS, hll_estimate


def _sketch(values) -> np.ndarray:
    regs = np.zeros(HLL_M, dtype=np.int64)
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg = h % HLL_M
        w = h >> HLL_P
        rho = (_HLL_W_BITS + 1) if w == 0 else \
            (_HLL_W_BITS + 1 - w.bit_length())
        regs[reg] = max(regs[reg], rho)
    return regs


def _invariant(regs: np.ndarray) -> tuple[int, int]:
    zeros = int((regs == 0).sum())
    harmonic = int(sum(1 << (_HLL_W_BITS + 1 - int(r)) if r else
                       1 << (_HLL_W_BITS + 1) for r in regs))
    return zeros, harmonic


def test_estimate_within_error_envelope():
    for n in (5_000, 20_000, 100_000):
        zeros, harmonic = _invariant(_sketch(range(n)))
        est = hll_estimate(zeros, harmonic)
        assert abs(est - n) / n < 0.10, (n, est)  # ~3 sigma


def test_small_range_linear_counting():
    for n in (10, 100, 500):
        zeros, harmonic = _invariant(_sketch(range(n)))
        est = hll_estimate(zeros, harmonic)
        assert abs(est - n) / n < 0.10, (n, est)


def test_merge_by_register_max():
    a = _sketch(range(0, 6000))
    b = _sketch(range(4000, 10_000))     # overlapping
    union = _sketch(range(0, 10_000))
    assert np.array_equal(np.maximum(a, b), union)

"""Partitioned Elias-Fano roundtrip + shape selection:

  - encode->decode is the identity on strictly increasing positive
    sequences, across the shapes that trigger each chunk type (sparse ->
    EF, dense -> bitmap, runs -> all-ones) and across chunk boundaries;
  - hypothesis: arbitrary strictly-increasing lists roundtrip;
  - invalid inputs rejected; empty list roundtrips;
  - dense/run-heavy lists measure SMALLER than pure EF (the reason PEF
    exists).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dint_spark.dint.pef import (ef_cost_bits, pef_decode, pef_encode,
                                 pef_encoded_bytes)


def _rt(vals):
    got = pef_decode(pef_encode(vals))
    assert np.array_equal(got, np.asarray(vals, dtype=np.int64)), vals[:10]


def test_roundtrip_shapes():
    _rt([1])
    _rt([5])
    _rt(np.arange(1, 1000))                    # pure run -> ALL1 chunks
    _rt(np.arange(1, 1000) * 1000)             # sparse -> EF chunks
    _rt(np.r_[np.arange(1, 200), 10_000_000])  # huge universe jump
    rng = np.random.default_rng(3)
    # dense-ish: ~70% fill -> bitmap competitive
    dense = np.flatnonzero(rng.random(5000) < 0.7) + 1
    _rt(dense)
    # mixed: run, then sparse tail, crossing many CUT_Q boundaries
    _rt(np.r_[np.arange(1, 3000),
              np.sort(rng.choice(np.arange(4000, 10 ** 7), size=4000,
                                 replace=False))])


def test_empty_and_invalid():
    assert len(pef_decode(pef_encode([]))) == 0
    with pytest.raises(ValueError):
        pef_encode([0, 1, 2])
    with pytest.raises(ValueError):
        pef_encode([1, 1, 2])
    with pytest.raises(ValueError):
        pef_encode([3, 2])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=1 << 30),
                min_size=1, max_size=400, unique=True))
def test_roundtrip_hypothesis(xs):
    _rt(np.sort(np.asarray(xs, dtype=np.int64)))


def test_partitioning_beats_plain_ef_on_clustered_ids():
    """A list that is one dense run plus a sparse tail: plain single-EF
    pays the whole universe in its high-bits stream, PEF isolates the
    run into near-zero-cost chunks."""
    rng = np.random.default_rng(11)
    run = np.arange(1, 20_001)                       # 20k-long run
    tail = np.sort(rng.choice(
        np.arange(10 ** 8, 2 * 10 ** 8), size=2000, replace=False))
    vals = np.r_[run, tail]
    pef_bits = pef_encoded_bytes(vals) * 8
    plain_ef_bits = ef_cost_bits(len(vals), int(vals[-1]))
    assert pef_bits < plain_ef_bits

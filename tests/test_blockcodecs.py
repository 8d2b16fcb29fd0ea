"""Block-codec comparison baselines (SURVEY §2 C4/C5/C6/C7 roles):

  - encode->decode is the identity for Simple16, StreamVByte,
    Varint-G8IU, OptPFor and QMX across zero-runs, small-value runs, large
    values at the codec's width ceiling, and Zipfian gap shapes;
  - hypothesis: arbitrary non-negative lists roundtrip (the reference's
    gap d[i]-d[i-1]-1 / freq-1 convention includes 0);
  - out-of-range values rejected; empty lists roundtrip;
  - shape sanity: OptPFor beats StreamVByte on small-gap blocks with
    rare outliers (the patched-exception case PFor exists for), and
    Simple16 packs a 0/1 stream at ~1 bit/int.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dint_spark.dint.blockcodecs import (CODECS, optpfor_encode,
                                         simple16_encode,
                                         streamvbyte_encode)


def _rt(name, vals):
    enc, dec = CODECS[name]
    vals = np.asarray(vals, dtype=np.int64)
    got = dec(enc(vals), len(vals))
    assert np.array_equal(got, vals), (name, vals[:10], got[:10])


_SHAPES = [
    [],
    [0],
    [0] * 300,
    [2 ** 28 - 1] * 3 + [0] * 40,
    list(np.random.default_rng(5).integers(0, 7, 1000)),
    list(np.random.default_rng(6).zipf(1.3, 700) % (2 ** 28)),
    list(range(129)),  # one full PFor block + 1
]


@pytest.mark.parametrize("name", sorted(CODECS))
def test_roundtrip_shapes(name):
    for vals in _SHAPES:
        _rt(name, vals)


@pytest.mark.parametrize("name", ["streamvbyte", "varintg8iu", "optpfor",
                                  "qmx"])
def test_u32_ceiling(name):
    _rt(name, [0xFFFFFFFF, 0, 1, 0xFFFFFFFF])
    with pytest.raises(ValueError):
        CODECS[name][0]([1 << 32])


def test_simple16_ceiling():
    with pytest.raises(ValueError):
        simple16_encode([1 << 28])
    with pytest.raises(ValueError):
        simple16_encode([-1])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 28) - 1),
                max_size=300))
def test_roundtrip_hypothesis(xs):
    for name in CODECS:
        _rt(name, xs)


def test_optpfor_patches_outliers():
    """126 tiny gaps + 2 large outliers per block: FOR at a small b plus
    2 patched exceptions must beat byte-aligned StreamVByte."""
    rng = np.random.default_rng(9)
    blk = rng.integers(0, 15, 128)
    blk[[40, 90]] = [10 ** 6, 5 * 10 ** 6]
    vals = np.tile(blk, 8)
    assert len(optpfor_encode(vals)) < len(streamvbyte_encode(vals))


def test_simple16_bit_density():
    """A 0/1 stream packs 28 values per 32-bit word (~1.14 bits/int)."""
    vals = np.random.default_rng(4).integers(0, 2, 2800)
    bits = len(simple16_encode(vals)) * 8 / len(vals)
    assert bits < 1.3

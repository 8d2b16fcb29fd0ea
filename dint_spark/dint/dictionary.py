"""DINT pattern dictionary: DSF selection, reserved codewords, rectangular
layout, encode map, artifact (de)serialization.

Semantic parity targets:
  * reserved entries 0..6 (2 exceptions + 5 zero-run codes), ref
    include/dint/single_dictionary.hpp:22,39-56
  * DSF = take patterns in (freq desc, size desc) order until full, ref
    include/dint/dictionary_builders.hpp:40-76 and the freq_length_sorter in
    include/dint/statistics_collectors.hpp:57-64; we additionally pin the
    total order with (pattern bytes asc) because std::sort leaves ties
    unspecified.
  * cost filter: keep a pattern iff
    freq * (48*size - 16) / total_integers > eps/1000  (eps = 1e-4), ref
    include/dint/dictionary_builders.hpp:15-38.
  * rectangular (num_entries x 16) table for O(1) vectorized decode gather,
    ref include/dint/rectangular_dictionary.hpp:14-56.
"""

from __future__ import annotations

import hashlib
import io
from dataclasses import dataclass, field

import numpy as np

from dint_spark.dint.codec import (
    EXCEPTIONS,
    MAX_ENTRY_SIZE,
    NUM_ENTRIES,
    RESERVED,
    RUN_LENS,
)

# cost model constants (ref dictionary_builders.hpp:15-26)
CODEWORD_BITS = 16.0
INITIAL_BPI = 3 * CODEWORD_BITS  # 48
EPS = 0.0001


def pattern_saving(size: int, freq: int, total_integers: int) -> float:
    return freq * (INITIAL_BPI * size - CODEWORD_BITS) / total_integers


@dataclass
class DintDictionary:
    """Driver-side dictionary object; broadcast to encode/decode UDFs."""

    table2d: np.ndarray = field(
        default_factory=lambda: np.zeros((NUM_ENTRIES, MAX_ENTRY_SIZE), dtype=np.uint32)
    )
    sizes: np.ndarray = field(
        default_factory=lambda: np.ones(NUM_ENTRIES, dtype=np.int64)
    )
    num_used: int = RESERVED
    encode_map: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        # reserved run codes 2..6 decode 256/128/64/32/16 zeros
        for i, run_len in enumerate(RUN_LENS):
            self.sizes[EXCEPTIONS + i] = run_len

    @classmethod
    def build(cls, patterns: list[bytes]) -> "DintDictionary":
        """patterns = pattern payloads (little-endian u32 bytes) already in
        DSF order, truncated to <= NUM_ENTRIES - RESERVED entries."""
        d = cls()
        assert len(patterns) <= NUM_ENTRIES - RESERVED
        for j, pat in enumerate(patterns):
            code = RESERVED + j
            arr = np.frombuffer(pat, dtype="<u4")
            assert 1 <= len(arr) <= MAX_ENTRY_SIZE
            d.table2d[code, : len(arr)] = arr
            d.sizes[code] = len(arr)
        d.num_used = RESERVED + len(patterns)
        d.prepare_for_encoding()
        return d

    def prepare_for_encoding(self) -> None:
        """bytes(pattern) -> codeword map. Zero-run patterns of length
        256/128/64/32/16 map to the reserved run codes (ref
        single_dictionary.hpp:154-165). Unlike the reference we key on the
        exact bytes, so lookups are collision-free."""
        m: dict = {}
        # patterns first, runs last so run codes win for all-zero patterns of
        # length 16 (1 codeword covering 16 ints beats a dict entry tie) --
        # same outcome as the reference, whose map is seeded with run codes
        # and never overwritten because pattern hashes are inserted after
        # (operator[] assignment overwrites!). NB the reference inserts runs
        # first then patterns with assignment, so an all-zero dict pattern
        # *would* overwrite the run code; but the pack policy dedupes such
        # patterns out. We keep run codes authoritative for all-zero keys.
        for code in range(RESERVED, self.num_used):
            size = int(self.sizes[code])
            key = self.table2d[code, :size].astype("<u4").tobytes()
            if key not in m:
                m[key] = code
        for i, run_len in enumerate(RUN_LENS):
            m[bytes(4 * run_len)] = EXCEPTIONS + i
        self.encode_map = m

    # -- artifact -----------------------------------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            sizes=self.sizes[: self.num_used].astype(np.int64),
            table=self.table2d[: self.num_used].astype(np.uint32),
            num_used=np.array([self.num_used], dtype=np.int64),
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "DintDictionary":
        with np.load(io.BytesIO(data)) as z:
            num_used = int(z["num_used"][0])
            d = cls()
            d.num_used = num_used
            d.table2d[:num_used] = z["table"]
            d.sizes[:num_used] = z["sizes"]
        d.prepare_for_encoding()
        return d

    def content_hash(self) -> str:
        h = hashlib.sha256()
        h.update(self.table2d[: self.num_used].tobytes())
        h.update(self.sizes[: self.num_used].tobytes())
        return h.hexdigest()[:16]


def select_patterns_dsf(
    stats: list[tuple[bytes, int, int]],
    total_integers: int,
    max_patterns: int = NUM_ENTRIES - RESERVED,
    eps_threshold: float = EPS / 1000,
) -> list[bytes]:
    """Decreasing Static Frequencies selection over aggregated pattern stats.

    stats rows: (pattern_bytes, size, freq). Applies the cost filter
    (singletons are always kept, matching block_statistics' special-casing of
    size-1 patterns), then sorts by (freq desc, size desc, bytes asc) and
    takes the top max_patterns.
    """
    kept = [
        (pat, size, freq)
        for (pat, size, freq) in stats
        if size == 1 or pattern_saving(size, freq, total_integers) > eps_threshold
    ]
    kept.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return [pat for pat, _, _ in kept[:max_patterns]]

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

_FOLD_R = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_FOLD_RINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_MIX_M1 = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 finalizer constants
_MIX_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(x: np.ndarray) -> np.ndarray:
    """Avalanche-mix u64 values elementwise (murmur3 finalizer; wrapping)."""
    x = np.array(x, dtype=np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX_M1
    x ^= x >> np.uint64(29)
    x *= _MIX_M2
    x ^= x >> np.uint64(32)
    return x


def fold_hash(cols_u64: np.ndarray, s: int) -> np.ndarray:
    """Position-weighted u64 hash over the s u32-columns of each row:
    ``sum_j mix64(col_j) * R^j`` (wrapping). s<=2 is packed exactly
    (injective); for s>=4 the avalanche mixing makes both window-vs-pattern
    false hits and pattern-vs-pattern ties ~2^-64 (the round-1 multiply
    fold collided constantly on small-valued gap patterns — e.g. (3,0,0,0)
    vs (0,1,0,0) — which forced the slow exact-window fallback and a
    verify-every-window gather). Matches the prefix-sum windowed form in
    codec._window_hashes exactly."""
    if s == 1:
        return cols_u64[:, 0].copy() if cols_u64.ndim == 2 else cols_u64
    if s == 2:
        return cols_u64[:, 0] | (cols_u64[:, 1] << np.uint64(32))
    rpow = np.empty(s, dtype=np.uint64)
    rpow[0] = 1
    np.cumprod(np.full(s - 1, _FOLD_R, dtype=np.uint64), out=rpow[1:])
    return (mix64(cols_u64) * rpow[None, :]).sum(axis=1, dtype=np.uint64)


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

    def __post_init__(self) -> None:
        # reserved run codes 2..6 decode 256/128/64/32/16 zeros
        for i, run_len in enumerate(RUN_LENS):
            self.sizes[EXCEPTIONS + i] = run_len
        self._encode_map: dict | None = None

    # -- broadcast-friendly pickling ----------------------------------------
    # Executors receive only the compacted numpy arrays; the (large) python
    # encode-map dict is rebuilt lazily per worker on first encode. This
    # keeps broadcast deserialization cheap (measured: eager 65k-entry dict
    # pickles dominated task startup at high core counts).
    def __getstate__(self) -> dict:
        return {
            "table": np.ascontiguousarray(self.table2d[: self.num_used]),
            "sizes": np.ascontiguousarray(self.sizes[: self.num_used]),
            "num_used": self.num_used,
        }

    def __setstate__(self, state: dict) -> None:
        self.table2d = np.zeros((NUM_ENTRIES, MAX_ENTRY_SIZE), dtype=np.uint32)
        self.sizes = np.ones(NUM_ENTRIES, dtype=np.int64)
        self.num_used = state["num_used"]
        self.table2d[: self.num_used] = state["table"]
        self.sizes[: self.num_used] = state["sizes"]
        for i, run_len in enumerate(RUN_LENS):
            self.sizes[EXCEPTIONS + i] = run_len
        self._encode_map = None
        self._lookup = None

    @property
    def encode_map(self) -> dict:
        if self._encode_map is None:
            self.prepare_for_encoding()
        return self._encode_map

    def lookup_tables(self) -> dict:
        """Per-size numeric lookup for the vectorized window matcher
        (codec._match_codes): one u64 searchsorted resolves all windows of a
        block at once (vs. per-window python dict lookups).

        key design: s=1 -> the u32 value; s=2 -> exact packed u64; s>=4 ->
        a multiply-fold u64 hash with exact verification against the raw
        pattern matrix (and a build-time duplicate-hash check, so matching
        stays deterministic-exact, never probabilistic)."""
        if getattr(self, "_lookup", None) is None:
            by_size: dict[int, list] = {}
            for pat, code in self.encode_map.items():
                by_size.setdefault(len(pat) // 4, []).append((pat, code))
            lookup = {}
            for s, items in by_size.items():
                codes = np.array([c for _, c in items], dtype=np.int64)
                mat = np.frombuffer(b"".join(p for p, _ in items),
                                    dtype="<u4").reshape(len(items), s)
                keys = fold_hash(mat.astype(np.uint64), s)
                order = np.argsort(keys, kind="stable")
                keys = keys[order]
                if s > 2 and len(keys) > 1 and (keys[1:] == keys[:-1]).any():
                    # hash ties among dict patterns: disambiguate by also
                    # keeping byte order within ties (searchsorted would be
                    # ambiguous) -- fall back to the exact void path
                    pats = np.frombuffer(b"".join(p for p, _ in sorted(items)),
                                         dtype=np.dtype((np.void, 4 * s)))
                    lookup[s] = ("void", pats,
                                 np.array([c for _, c in sorted(items)],
                                          dtype=np.int64))
                else:
                    lookup[s] = ("num", keys, codes[order],
                                 np.ascontiguousarray(mat[order]))
            self._lookup = lookup
        return self._lookup

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
        self._encode_map = m

    # -- artifact -----------------------------------------------------------
    # B8 pack_policy (ref dictionary_building_utils.hpp:241-293 +
    # single_dictionary.hpp:125-151): compaction is a TABLE-STORAGE
    # optimization — every selected entry keeps its codeword, but an entry
    # that is a prefix of a longer entry stores no bytes of its own; its
    # descriptor (size<<24 | offset) points into the longer entry's slot
    # (the reference resolves this with std::search over the packed table).
    # It cannot change bpi (the encoded stream references codewords, not
    # offsets); it shrinks the serialized dictionary artifact.
    def to_bytes(self, policy: str = "pack") -> bytes:
        """policy='pack' (B8 dedupe + prefix sharing) or 'overlap' (B9
        substring drop + greedy superstring packing). Both are loss-free:
        from_bytes reconstructs the identical dictionary."""
        pack = _pack_entries_overlap if policy == "overlap" else _pack_entries
        descriptors, flat = pack(
            self.table2d, self.sizes, RESERVED, self.num_used)
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            descriptors=descriptors,
            flat=flat,
            num_used=np.array([self.num_used], dtype=np.int64),
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "DintDictionary":
        with np.load(io.BytesIO(data)) as z:
            num_used = int(z["num_used"][0])
            d = cls()
            d.num_used = num_used
            if "table" in z.files:  # round-1 dense artifact
                d.table2d[:num_used] = z["table"]
                d.sizes[:num_used] = z["sizes"]
            else:
                _unpack_entries(z["descriptors"], z["flat"], RESERVED,
                                d.table2d, d.sizes)
        return d

    def content_hash(self) -> str:
        h = hashlib.sha256()
        h.update(self.table2d[: self.num_used].tobytes())
        h.update(self.sizes[: self.num_used].tobytes())
        return h.hexdigest()[:16]

    def cache_token(self) -> str:
        """content_hash memoized per (worker) object. Decode caches key by
        payload bytes, and a DINT payload is dictionary CODES: two docid
        shards routinely emit byte-identical codewords that decode to
        different postings under their own learned dictionaries, so every
        payload-keyed cache must also key by dictionary content."""
        tok = getattr(self, "_cache_token", None)
        if tok is None:
            tok = self.content_hash()
            self._cache_token = tok
        return tok

    # -- block codec hooks (dispatched from codec.encode_block/decode_block) -
    def encode_full_block(self, vals: np.ndarray, optimal: bool = True) -> bytes:
        from dint_spark.dint.codec import encode_block_dint

        return encode_block_dint(vals, self, optimal=optimal)

    def decode_full_block(self, data: bytes, pos: int, n: int
                          ) -> tuple[np.ndarray, int]:
        from dint_spark.dint.codec import decode_block_dint

        return decode_block_dint(data, pos, n, self.table2d, self.sizes)


def _pack_entries(table2d: np.ndarray, sizes: np.ndarray, start: int,
                  num_used: int) -> tuple[np.ndarray, np.ndarray]:
    """pack_policy compaction of entries [start, num_used): dedupe +
    prefix-drop for STORAGE (every entry keeps a descriptor; dropped
    prefixes point into their superseding entry's offset).

    Returns (descriptors u32[num_used-start] with (size-1)<<24 | offset,
    flat u32 packed table). Deterministic: survivors are laid out in
    descending size then codeword order; a prefix binds to the first
    registered superseding slot."""
    entries = []
    for code in range(start, num_used):
        s = int(sizes[code])
        entries.append((code, table2d[code, :s].astype("<u4").tobytes(), s))
    # survivors: entries that are NOT a proper prefix of any other entry.
    # Entry sizes are powers of two, so the set of all proper power-of-two
    # prefixes of all entries decides membership in O(n log MAX_ENTRY_SIZE).
    # (Identical duplicates cannot occur: selection dedupes patterns.)
    prefix_set: set[bytes] = set()
    for _, key, s in entries:
        t = s // 2
        while t >= 1:
            prefix_set.add(key[: 4 * t])
            t //= 2
    survivors = [e for e in entries if e[1] not in prefix_set]
    # lay out survivors longest-first so every prefix lookup hits a start
    survivors.sort(key=lambda e: (-e[2], e[0]))
    flat = bytearray()
    offset_of: dict[bytes, int] = {}
    for _, key, s in survivors:
        off = len(flat) // 4
        flat += key
        # register this slot for the entry itself and all power-of-two
        # prefixes (entry sizes are powers of two <= 16)
        t = s
        while t >= 1:
            offset_of.setdefault(key[: 4 * t], off)
            t //= 2
    descriptors = np.empty(len(entries), dtype=np.uint32)
    for i, (_, key, s) in enumerate(entries):
        descriptors[i] = np.uint32(((s - 1) << 24) | offset_of[key])
    return descriptors, np.frombuffer(bytes(flat), dtype="<u4")


def _ref_overlap(a: bytes, b: bytes) -> int:
    """The reference's compute_overlap (dictionary_building_utils.hpp:63-73):
    the largest L such that for EVERY k <= L the last k u32 of A equal the
    first k u32 of B (the loop stops at the first failing k — a chained
    overlap, not the standard longest suffix-prefix match)."""
    m = min(len(a), len(b)) // 4
    for k in range(1, m + 1):
        if a[-4 * k:] != b[: 4 * k]:
            return k - 1
    return m


def _pack_entries_overlap(table2d: np.ndarray, sizes: np.ndarray, start: int,
                          num_used: int, cand_cap: int = 64
                          ) -> tuple[np.ndarray, np.ndarray]:
    """B9 overlap_policy compaction (ref dictionary_building_utils.hpp:
    92-239): storage-only, like pack_policy — every entry keeps its
    codeword; the flat table is shrunk further by (1) dropping entries
    contained as a SUBSTRING of a longer entry (any offset, not just
    prefixes) and (2) greedily merging remaining entries by chained
    suffix-prefix overlap into superstrings (largest overlap first,
    deterministic tie-breaks).

    Deviation from the reference, documented: the reference scans all
    O(n^2) pairs; with 65k zero-heavy gap patterns that is infeasible in
    Python, so overlap candidates are discovered via 2-symbol
    suffix->prefix hash maps with a deterministic per-bucket cap
    (cand_cap). The packing stays exact (descriptors always point at the
    entry's bytes inside the table); the cap only bounds how much extra
    space sharing is found."""
    entries = []
    for code in range(start, num_used):
        s = int(sizes[code])
        entries.append((table2d[code, :s].astype("<u4").tobytes(), s))
    # reference order: (size asc, bytes asc) after dedupe (target_t op<)
    uniq = sorted(set(entries), key=lambda e: (e[1], e[0]))

    # ---- (1) substring containment drop (longest-first sweep) ------------
    sub_set: set[bytes] = set()
    survivors: list[bytes] = []
    for key, s in sorted(uniq, key=lambda e: (-e[1], e[0])):
        if key in sub_set:
            continue  # contained in some strictly longer survivor
        survivors.append(key)
        nb = len(key)
        for lo in range(0, nb, 4):
            for hi in range(lo + 4, nb + 4, 4):
                if (lo, hi) != (0, nb):
                    sub_set.add(key[lo:hi])

    # ---- (2) greedy chained suffix-prefix overlap merging ----------------
    # overlap >= 2 requires suffix2(A) == prefix2(B) (chained definition),
    # so 8-byte prefix/suffix hash maps discover all candidate pairs
    import heapq

    strings: list[bytes | None] = sorted(survivors)  # deterministic ids
    by_prefix2: dict[bytes, list[int]] = {}
    by_suffix2: dict[bytes, list[int]] = {}

    def register(i: int) -> None:
        sv = strings[i]
        if len(sv) >= 8:
            by_prefix2.setdefault(sv[:8], []).append(i)
            by_suffix2.setdefault(sv[-8:], []).append(i)

    for i in range(len(strings)):
        register(i)

    pq: list[tuple[int, int, int]] = []

    def push_pairs(i: int) -> None:
        a = strings[i]
        if a is None or len(a) < 8:
            return
        for j in by_prefix2.get(a[-8:], [])[:cand_cap]:  # a -> j
            b = strings[j]
            if j != i and b is not None:
                ov = _ref_overlap(a, b)
                if ov > 1:
                    heapq.heappush(pq, (-ov, i, j))
        for j in by_suffix2.get(a[:8], [])[:cand_cap]:  # j -> a
            b = strings[j]
            if j != i and b is not None:
                ov = _ref_overlap(b, a)
                if ov > 1:
                    heapq.heappush(pq, (-ov, j, i))

    for i in range(len(strings)):
        a = strings[i]
        if len(a) < 8:
            continue
        for j in by_prefix2.get(a[-8:], [])[:cand_cap]:
            if j != i:
                ov = _ref_overlap(a, strings[j])
                if ov > 1:
                    pq.append((-ov, i, j))
    heapq.heapify(pq)

    while pq:
        negov, i, j = heapq.heappop(pq)
        a, b = strings[i], strings[j]
        if a is None or b is None or i == j:
            continue
        if _ref_overlap(a, b) != -negov:
            continue  # stale entry
        merged = a + b[4 * (-negov):]
        strings[i] = None
        strings[j] = None
        strings.append(merged)
        ni = len(strings) - 1
        register(ni)
        push_pairs(ni)

    supers = [s for s in strings if s is not None]

    # ---- (3) single-symbol overlap merge (ref :146-171) ------------------
    merged_flag = [False] * len(supers)
    for i in range(len(supers)):
        if merged_flag[i]:
            continue
        last = supers[i][-4:]
        for j in range(len(supers)):
            if i != j and not merged_flag[j] and supers[j][:4] == last:
                supers[i] = supers[i] + supers[j][4:]
                merged_flag[j] = True
                break
    supers = [s for i, s in enumerate(supers) if not merged_flag[i]]

    # ---- (4) flat table + descriptor lookup ------------------------------
    flat = bytearray()
    pos_of: dict[bytes, int] = {}
    for sstr in supers:
        base = len(flat) // 4
        flat += sstr
        L = len(sstr) // 4
        for t in (1, 2, 4, 8, 16):  # entry sizes are powers of two
            if t > L:
                break
            for off in range(0, L - t + 1):
                pos_of.setdefault(sstr[4 * off: 4 * (off + t)], base + off)
    descriptors = np.empty(len(entries), dtype=np.uint32)
    for i, (key, s) in enumerate(entries):
        descriptors[i] = np.uint32(((s - 1) << 24) | pos_of[key])
    return descriptors, np.frombuffer(bytes(flat), dtype="<u4")


def _unpack_entries(descriptors: np.ndarray, flat: np.ndarray, start: int,
                    table2d: np.ndarray, sizes: np.ndarray) -> None:
    for i, d in enumerate(np.asarray(descriptors, dtype=np.uint64)):
        s = int(d >> np.uint64(24)) + 1
        off = int(d & np.uint64((1 << 24) - 1))
        code = start + i
        table2d[code, :s] = flat[off: off + s]
        sizes[code] = s


# --------------------------------------------------------------------------
# multi-dictionary contexts (ref include/dint/multi_dictionary.hpp:15-52,
# statistics_collectors.hpp:21-40, dint_codecs.hpp:285-458)
# --------------------------------------------------------------------------

NUM_SELECTOR_CLASSES = 6


def selector_class(block_max: int) -> int:
    """Context class of a block by the bit-width of its max value:
    ceil_log2(ceil_log2(max+1)) clamped to 0..5 — widths <=1,2,4,8,16,else.
    (ref statistics_collectors.hpp:21-40)"""
    bw = int(block_max).bit_length()  # 0 for max==0
    if bw <= 1:
        return 0
    return min((bw - 1).bit_length(), NUM_SELECTOR_CLASSES - 1)


def default_class_map(num_dicts: int) -> list[int]:
    """Map the 6 selector classes onto num_dicts dictionaries. For the
    double-dictionary variant (num_dicts=2) classes with width <= 8 bits
    (dense gaps / small freqs) share dict 0, wider blocks dict 1."""
    if num_dicts >= NUM_SELECTOR_CLASSES:
        return list(range(NUM_SELECTOR_CLASSES))
    if num_dicts == 2:
        return [0, 0, 0, 0, 1, 1]
    # general: even split of the 6 classes
    return [min(c * num_dicts // NUM_SELECTOR_CLASSES, num_dicts - 1)
            for c in range(NUM_SELECTOR_CLASSES)]


@dataclass
class MultiDictionary:
    """K context dictionaries; each full block is encoded with the dictionary
    that yields the fewest bytes (exhaustive choice, ref
    dint_codecs.hpp:410-432) and prefixed with a 1-byte dict selector."""

    dicts: list = field(default_factory=list)
    class_map: list = field(default_factory=lambda: default_class_map(2))

    @property
    def num_dicts(self) -> int:
        return len(self.dicts)

    def encode_full_block(self, vals: np.ndarray, optimal: bool = True) -> bytes:
        from dint_spark.dint.codec import encode_block_dint

        best: bytes | None = None
        best_i = 0
        for i, d in enumerate(self.dicts):
            enc = encode_block_dint(vals, d, optimal=optimal)
            if best is None or len(enc) < len(best):
                best = enc
                best_i = i
        return bytes([best_i]) + best

    def decode_full_block(self, data: bytes, pos: int, n: int
                          ) -> tuple[np.ndarray, int]:
        from dint_spark.dint.codec import decode_block_dint

        d = self.dicts[data[pos]]
        return decode_block_dint(data, pos + 1, n, d.table2d, d.sizes)

    def to_bytes(self, policy: str = "pack") -> bytes:
        buf = io.BytesIO()
        pack = _pack_entries_overlap if policy == "overlap" else _pack_entries
        arrays = {
            "kind": np.array([1], dtype=np.int64),
            "num_dicts": np.array([len(self.dicts)], dtype=np.int64),
            "class_map": np.array(self.class_map, dtype=np.int64),
        }
        for i, d in enumerate(self.dicts):
            desc, flat = pack(d.table2d, d.sizes, RESERVED, d.num_used)
            arrays[f"descriptors_{i}"] = desc
            arrays[f"flat_{i}"] = flat
            arrays[f"num_used_{i}"] = np.array([d.num_used], dtype=np.int64)
        np.savez_compressed(buf, **arrays)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MultiDictionary":
        with np.load(io.BytesIO(data)) as z:
            k = int(z["num_dicts"][0])
            dicts = []
            for i in range(k):
                d = DintDictionary()
                d.num_used = int(z[f"num_used_{i}"][0])
                if f"table_{i}" in z.files:  # round-1 dense artifact
                    d.table2d[: d.num_used] = z[f"table_{i}"]
                    d.sizes[: d.num_used] = z[f"sizes_{i}"]
                else:
                    _unpack_entries(z[f"descriptors_{i}"], z[f"flat_{i}"],
                                    RESERVED, d.table2d, d.sizes)
                dicts.append(d)
            return cls(dicts=dicts, class_map=[int(c) for c in z["class_map"]])

    def content_hash(self) -> str:
        h = hashlib.sha256()
        for d in self.dicts:
            h.update(d.content_hash().encode())
        h.update(bytes(self.class_map))
        return h.hexdigest()[:16]

    def cache_token(self) -> str:
        """See DintDictionary.cache_token — same contract."""
        tok = getattr(self, "_cache_token", None)
        if tok is None:
            tok = self.content_hash()
            self._cache_token = tok
        return tok


def load_dictionary(data: bytes):
    """Artifact dispatcher: MultiDictionary artifacts carry a 'kind' array."""
    with np.load(io.BytesIO(data)) as z:
        is_multi = "kind" in z.files
    return (MultiDictionary if is_multi else DintDictionary).from_bytes(data)


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


def select_patterns_pdf(
    stats: list[tuple[bytes, int, int]],
    total_integers: int,
    max_patterns: int = NUM_ENTRIES - RESERVED,
    eps_threshold: float = EPS / 1000,
) -> list[bytes]:
    """PDF — Prefix-Discounted Frequencies (the paper's alternative to DSF;
    the reference snapshot ships only DSF, see scripts/build_dint_indexes.py:5
    which names both strategies).

    Greedy selection by current (discounted) frequency: when a pattern P of
    size s is selected, the frequencies of its two aligned halves (and
    recursively their halves) are discounted by freq(P), because occurrences
    of P already cover those occurrences of its sub-patterns. Implemented as
    a lazy max-heap: popped entries whose cached freq is stale are re-pushed
    with the updated value. Deterministic: ties break (size desc, bytes asc).
    """
    import heapq

    freq: dict[tuple[bytes, int], int] = {}
    for pat, size, f in stats:
        if size == 1 or pattern_saving(size, f, total_integers) > eps_threshold:
            freq[(pat, size)] = f

    heap = [(-f, -size, pat) for (pat, size), f in freq.items()]
    heapq.heapify(heap)
    out: list[bytes] = []
    selected: set[tuple[bytes, int]] = set()
    while heap and len(out) < max_patterns:
        nf, nsize, pat = heapq.heappop(heap)
        size = -nsize
        key = (pat, size)
        cur = freq.get(key, 0)
        if key in selected:
            continue
        if -nf != cur:  # stale: re-insert with discounted frequency
            if cur > 0:
                heapq.heappush(heap, (-cur, nsize, pat))
            continue
        if cur <= 0:
            continue
        selected.add(key)
        out.append(pat)
        # discount all aligned power-of-two sub-windows
        s = size // 2
        while s >= 1:
            w = 4 * s
            for off in range(0, 4 * size, w):
                sub = (pat[off: off + w], s)
                if sub in freq:
                    freq[sub] = max(0, freq[sub] - cur)
            s //= 2
    return out


SELECTORS = {
    "dsf": select_patterns_dsf,
    "pdf": select_patterns_pdf,
}

"""Partitioned Elias-Fano — the reference's comparison baseline codec.

The reference's benchmark table carries a "PEF eps-opt" row next to the
DINT rows (reference README Benchmark table; algorithm from Ottaviano &
Venturini, "Partitioned Elias-Fano Indexes", SIGIR 2014 — a published
method, implemented here from the paper, not from the reference's
headers). This module provides the same role for our bench: a real
encoder/decoder producing actual bytes, so `scripts/bpi_ab.py` can put
a measured PEF bits-per-posting next to the DINT rows under the
reference's own protocol (output_bytes * 8 / postings).

Model (the paper's):
  - a monotone docid list splits into chunks; each chunk stores its
    elements relative to the previous chunk's upper bound, encoded as
    the cheapest of three shapes:
      * EF      — classic Elias-Fano: low bits l = floor(log2(u/n)),
                  n*l low bits + a unary high-bits stream (n + (u>>l)+1
                  bits);
      * BITMAP  — a u-bit bitvector (wins for dense chunks);
      * ALL1    — zero body bits when the chunk is a run (n == u), the
                  case that makes PEF beat plain EF on clustered ids;
  - chunk skeleton: per chunk varint(count-1) + varint((relative
    universe - count) << 2 | type) — the chunk count is implicit (metas
    parse until their counts sum to n) and the 2-bit type rides the
    universe varint, so a run chunk's skeleton is 2 bytes; all counted
    into the measured size.

Partitioning: dynamic programming over cuts restricted to multiples of
``CUT_Q`` (64) with chunk length capped at ``MAX_CHUNK`` — exact within
that cut lattice. This is a documented deviation from the paper's
(1+eps)-approximate sliding-window DP: quantized cuts keep the
optimizer a small vectorizable DP (the paper's own experiments show
boundary placement contributes far less than the three-shape choice),
and the encoder stays O(n * MAX_CHUNK/CUT_Q) per list.

Freqs are encoded as the prefix-sum sequence (f_i >= 1 so the sums are
strictly increasing) — ds2i's positive_sequence convention, which is
what the reference's PEF freq row measures.

Scale note: encoding is per-posting-list (embarrassingly parallel over
lists — the same mapInPandas lane the DINT encoder uses); nothing here
is driver-bound.
"""

from __future__ import annotations

import numpy as np

CUT_Q = 64        # candidate cut quantum
MAX_CHUNK = 4096  # longest chunk the DP may choose
_T_EF, _T_BITMAP, _T_ALL1 = 0, 1, 2


class _BitWriter:
    """Append-only LSB-first bit stream over uint64 words."""

    __slots__ = ("words", "cur", "fill")

    def __init__(self):
        self.words: list[int] = []
        self.cur = 0
        self.fill = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self.cur |= value << self.fill
        self.fill += nbits
        while self.fill >= 64:
            self.words.append(self.cur & 0xFFFFFFFFFFFFFFFF)
            self.cur >>= 64
            self.fill -= 64

    def write_unary(self, q: int) -> None:
        """q zero bits then a one bit."""
        while q >= 63:
            self.write(0, 63)
            q -= 63
        self.write(1 << q, q + 1)

    def getbuffer(self) -> bytes:
        words = list(self.words)
        if self.fill:
            words.append(self.cur & 0xFFFFFFFFFFFFFFFF)
        return np.asarray(words, dtype=np.uint64).tobytes()

    @property
    def bitlen(self) -> int:
        return 64 * len(self.words) + self.fill


class _BitReader:
    __slots__ = ("words", "pos")

    def __init__(self, buf: bytes):
        self.words = np.frombuffer(buf, dtype=np.uint64)
        self.pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        out, got = 0, 0
        while got < nbits:
            w = self.pos >> 6
            off = self.pos & 63
            take = min(nbits - got, 64 - off)
            bits = (int(self.words[w]) >> off) & ((1 << take) - 1)
            out |= bits << got
            got += take
            self.pos += take
        return out

    def read_unary(self) -> int:
        q = 0
        while True:
            w = self.pos >> 6
            off = self.pos & 63
            chunk = int(self.words[w]) >> off
            if chunk == 0:
                q += 64 - off
                self.pos += 64 - off
                continue
            tz = (chunk & -chunk).bit_length() - 1
            q += tz
            self.pos += tz + 1
            return q


def _ef_low_bits(n: int, u: int) -> int:
    if n == 0 or u <= n:
        return 0
    return int(u // n).bit_length() - 1


def ef_cost_bits(n: int, u: int) -> int:
    """Elias-Fano size for n values in [1, u]."""
    l = _ef_low_bits(n, u)
    return n * l + n + (u >> l) + 1


def _chunk_cost(n: int, u: int) -> tuple[int, int]:
    """(best encoding type, body bits) for a chunk of n values whose
    relative universe (last value) is u >= n."""
    if n == u:
        return _T_ALL1, 0
    ef = ef_cost_bits(n, u)
    if u < ef:
        return _T_BITMAP, u
    return _T_EF, ef


def _varint_cost(x: int) -> int:
    return 8 * max(1, (x.bit_length() + 6) // 7)


def _write_varint(out: bytearray, x: int) -> None:
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    x, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, pos
        shift += 7


def _partition(vals: np.ndarray) -> list[int]:
    """DP over the CUT_Q-quantized cut lattice: returns cut indices
    (ascending, ending at n). Chunk (j, i] cost = skeleton varints +
    2 bits type + best body."""
    n = len(vals)
    cuts = list(range(CUT_Q, n, CUT_Q)) + [n]
    nodes = [0] + cuts
    best = [0] + [1 << 62] * (len(nodes) - 1)
    prev = [0] * len(nodes)
    for i in range(1, len(nodes)):
        hi_i = nodes[i]
        for j in range(i - 1, -1, -1):
            lo = nodes[j]
            if hi_i - lo > MAX_CHUNK:
                break
            base = int(vals[lo - 1]) if lo else 0
            cn = hi_i - lo
            cu = int(vals[hi_i - 1]) - base
            typ, body = _chunk_cost(cn, cu)
            cost = (best[j] + body + _varint_cost(cn - 1)
                    + _varint_cost((cu - cn) << 2 | typ))
            if cost < best[i]:
                best[i] = cost
                prev[i] = j
    out = []
    i = len(nodes) - 1
    while i > 0:
        out.append(nodes[i])
        i = prev[i]
    return out[::-1]


def pef_encode(vals) -> bytes:
    """Encode a strictly-increasing positive int sequence. Returns the
    full byte payload (skeleton + bit-packed chunk bodies)."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) == 0:
        return b"\x00"
    if np.any(np.diff(vals) <= 0) or vals[0] < 1:
        raise ValueError("pef_encode needs a strictly increasing "
                         "positive sequence")
    cuts = _partition(vals)
    head = bytearray()
    _write_varint(head, len(vals))
    bw = _BitWriter()
    lo_idx = 0
    base = 0
    for hi in cuts:
        chunk = vals[lo_idx:hi]
        cn = len(chunk)
        cu = int(chunk[-1]) - base
        typ, _ = _chunk_cost(cn, cu)
        # skeleton: varint(cn-1) + varint((cu-cn) << 2 | type) — chunk
        # count is implicit (metas parse until their cn sum reaches n),
        # cu >= cn always, and the 2-bit type rides the same varint
        _write_varint(head, cn - 1)
        _write_varint(head, (cu - cn) << 2 | typ)
        rel = (chunk - base).astype(np.int64)
        if typ == _T_EF:
            l = _ef_low_bits(cn, cu)
            prev_hi = 0
            for v in rel:
                v = int(v)
                if l:
                    bw.write(v & ((1 << l) - 1), l)
                hi_part = v >> l
                bw.write_unary(hi_part - prev_hi)
                prev_hi = hi_part
        elif typ == _T_BITMAP:
            bits = np.zeros(cu, dtype=bool)
            bits[rel - 1] = True
            for w_start in range(0, cu, 63):
                seg = bits[w_start:w_start + 63]
                word = 0
                for bi, b in enumerate(seg):
                    if b:
                        word |= 1 << bi
                bw.write(word, len(seg))
        # _T_ALL1: no body
        base = int(chunk[-1])
        lo_idx = hi
    return bytes(head) + bw.getbuffer()


def pef_decode(buf: bytes) -> np.ndarray:
    """Inverse of pef_encode."""
    n, pos = _read_varint(buf, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    metas = []
    seen = 0
    while seen < n:
        cn, pos = _read_varint(buf, pos)
        cn += 1
        packed, pos = _read_varint(buf, pos)
        metas.append((cn, (packed >> 2) + cn, packed & 3))
        seen += cn
    body = buf[pos:]
    pad = (-len(body)) % 8
    br = _BitReader(body + b"\x00" * pad)
    out = np.empty(n, dtype=np.int64)
    w = 0
    base = 0
    for cn, cu, typ in metas:
        if typ == _T_ALL1:
            out[w:w + cn] = base + np.arange(1, cn + 1)
        elif typ == _T_EF:
            l = _ef_low_bits(cn, cu)
            prev_hi = 0
            for i in range(cn):
                low = br.read(l) if l else 0
                prev_hi += br.read_unary()
                out[w + i] = base + (prev_hi << l | low)
        else:  # bitmap
            rel = []
            bitpos = 0
            for w_start in range(0, cu, 63):
                take = min(63, cu - w_start)
                word = br.read(take)
                while word:
                    tz = (word & -word).bit_length() - 1
                    rel.append(w_start + tz + 1)
                    word &= word - 1
            out[w:w + cn] = base + np.asarray(rel, dtype=np.int64)
        base = int(out[w + cn - 1])
        w += cn
    return out


def pef_encoded_bytes(vals) -> int:
    """len(pef_encode(vals)) without keeping the buffer (bpi helper)."""
    return len(pef_encode(vals))

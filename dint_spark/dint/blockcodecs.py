"""Block-codec comparison baselines: Simple16, StreamVByte, Varint-G8IU,
OptPFor, QMX.

The reference benchmarks DINT against a family of block codecs
(`include/ds2i/block_codecs.hpp:153-507` — OptPFor via FastPFor,
Varint-G8IU, QMX, vbyte/simple16/streamvbyte wrappers; SURVEY §2 rows
C4/C5/C6/C7). Those rows are comparison baselines in the paper's benchmark
table, not part of the DINT index format — same adjudication as PEF
(`dint_spark/dint/pef.py`), and this module plays the same role:
REAL encoders/decoders producing actual bytes, implemented from the
published papers (not translated from the reference's headers), so
`scripts/bpi_ab.py` can print measured bits-per-posting rows for each
next to the DINT rows under the reference's own protocol
(output_bytes * 8 / postings, gaps d[i]-d[i-1]-1, freqs f-1).

Sources (all public):
  - Simple16: Zhang, Long & Suel, WWW 2008 ("Performance of compressed
    inverted list caching in search engines") — 16 ways to pack 28
    payload bits of a 32-bit word, 4-bit selector.
  - StreamVByte: Lemire, Kurz & Rupp, Information Processing Letters
    2018 — groups of 4 values, one control byte (2 bits/value = byte
    length 1..4) in a separate stream from the data bytes.
  - Varint-G8IU: Stepanov, Gangolli, Rose, Ernst & Oberoi, CIKM 2011 —
    8-byte data groups prefixed by a descriptor byte whose set bits mark
    the terminating byte of each integer; an integer never spans groups.
  - OptPFor (OPT-PFD): Yan, Ding & Suel, WWW 2009 — per 128-int block,
    FOR with b low bits for every slot and patched exceptions; b chosen
    per block to minimize encoded size (low bits + exception positions
    + exception remainders).
  - QMX: Trotman, ADCS 2014 ("Compression, SIMD, and Postings Lists")
    — 128-bit data words each packed at one bit width, selector bytes
    (width class + run length) in a separate stream.

Encoding here is per posting list inside the same mapInPandas lane the
DINT/PEF encoders use (embarrassingly parallel over lists, nothing
driver-bound); these are measurement codecs, so clarity wins over
micro-optimized Python. All accept non-negative int sequences (the
reference's gap/freq-minus-one convention).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Simple16
# ---------------------------------------------------------------------------

# The canonical selector table: (count, tuple of per-value bit widths),
# each row summing to 28 payload bits.
_S16_MODES: list[tuple[int, tuple[int, ...]]] = [
    (28, (1,) * 28),
    (21, (2,) * 7 + (1,) * 14),
    (21, (1,) * 7 + (2,) * 7 + (1,) * 7),
    (21, (1,) * 14 + (2,) * 7),
    (14, (2,) * 14),
    (9, (4,) * 1 + (3,) * 8),
    (8, (3,) * 1 + (4,) * 4 + (3,) * 3),
    (7, (4,) * 7),
    (6, (5,) * 4 + (4,) * 2),
    (6, (4,) * 2 + (5,) * 4),
    (5, (6,) * 3 + (5,) * 2),
    (5, (5,) * 2 + (6,) * 3),
    (4, (7,) * 4),
    (3, (10,) * 1 + (9,) * 2),
    (2, (14,) * 2),
    (1, (28,) * 1),
]
_S16_MAX = (1 << 28) - 1


def simple16_encode(vals) -> bytes:
    """Pack non-negative ints < 2^28 into 32-bit selector words."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) and (vals.min() < 0 or vals.max() > _S16_MAX):
        raise ValueError("simple16 needs 0 <= v < 2^28")
    words: list[int] = []
    i, n = 0, len(vals)
    while i < n:
        for sel, (cnt, widths) in enumerate(_S16_MODES):
            # a partial tail group is padded with zeros (the count is
            # external — decode stops after n values)
            chunk = vals[i:i + cnt]
            ok = all(int(v) < (1 << w) for v, w in zip(chunk, widths))
            if ok:
                word = sel << 28
                shift = 0
                for j, w in enumerate(widths):
                    v = int(chunk[j]) if j < len(chunk) else 0
                    word |= v << shift
                    shift += w
                words.append(word)
                i += min(cnt, len(chunk))
                break
        else:  # pragma: no cover - mode 15 always fits v < 2^28
            raise AssertionError("no simple16 mode fits")
    return np.asarray(words, dtype=np.uint32).tobytes()


def simple16_decode(buf: bytes, n: int) -> np.ndarray:
    """Inverse of simple16_encode (n = value count, stored externally
    like ds2i's block decoders take the block size)."""
    words = np.frombuffer(buf, dtype=np.uint32)
    out = np.empty(n, dtype=np.int64)
    w_i, o = 0, 0
    while o < n:
        word = int(words[w_i])
        w_i += 1
        sel = word >> 28
        _, widths = _S16_MODES[sel]
        shift = 0
        for w in widths:
            if o >= n:
                break
            out[o] = (word >> shift) & ((1 << w) - 1)
            shift += w
            o += 1
    return out


# ---------------------------------------------------------------------------
# StreamVByte
# ---------------------------------------------------------------------------


def streamvbyte_encode(vals) -> bytes:
    """Control stream (2 bits/value packed 4-per-byte) followed by the
    data stream; values are u32."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) and (vals.min() < 0 or vals.max() > 0xFFFFFFFF):
        raise ValueError("streamvbyte needs 0 <= v < 2^32")
    n = len(vals)
    # byte length 1..4 per value -> 2-bit code 0..3 (vectorized)
    v = vals.astype(np.uint32)
    nbytes = np.ones(n, dtype=np.uint8)
    nbytes[v > 0xFF] = 2
    nbytes[v > 0xFFFF] = 3
    nbytes[v > 0xFFFFFF] = 4
    codes = (nbytes - 1).astype(np.uint8)
    ctrl = np.zeros((n + 3) // 4, dtype=np.uint8)
    for k in range(4):
        part = codes[k::4]
        ctrl[: len(part)] |= part << (2 * k)
    # data: little-endian bytes of each value, truncated to its length
    le = v.view(np.uint8).reshape(n, 4) if n else np.empty((0, 4),
                                                           dtype=np.uint8)
    mask = np.arange(4)[None, :] < nbytes[:, None]
    data = le[mask]
    return ctrl.tobytes() + data.tobytes()


def streamvbyte_decode(buf: bytes, n: int) -> np.ndarray:
    ctrl = np.frombuffer(buf, dtype=np.uint8, count=(n + 3) // 4)
    codes = np.empty(n, dtype=np.uint8)
    for k in range(4):
        take = len(codes[k::4])
        codes[k::4] = (ctrl[:take] >> (2 * k)) & 3
    nbytes = codes.astype(np.int64) + 1
    data = np.frombuffer(buf, dtype=np.uint8, offset=len(ctrl))
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(n, dtype=np.int64)
    # gather per byte-position (at most 4 vectorized passes)
    for k in range(4):
        sel = nbytes > k
        out[sel] |= data[starts[sel] + k].astype(np.int64) << (8 * k)
    return out


# ---------------------------------------------------------------------------
# Varint-G8IU
# ---------------------------------------------------------------------------


def varintg8iu_encode(vals) -> bytes:
    """Groups of 1 descriptor byte + 8 data bytes. Descriptor bit i set
    = data byte i terminates an integer; an integer never spans groups,
    unused trailing bytes have clear bits and are skipped on decode."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) and (vals.min() < 0 or vals.max() > 0xFFFFFFFF):
        raise ValueError("varint-g8iu needs 0 <= v < 2^32")
    out = bytearray()
    i, n = 0, len(vals)
    while i < n:
        desc = 0
        data = bytearray()
        while i < n:
            v = int(vals[i])
            nb = max(1, (v.bit_length() + 7) // 8)
            if len(data) + nb > 8:
                break
            data += v.to_bytes(nb, "little")
            desc |= 1 << (len(data) - 1)
            i += 1
        data += b"\x00" * (8 - len(data))
        out.append(desc)
        out += data
    return bytes(out)


def varintg8iu_decode(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    o, pos = 0, 0
    while o < n:
        desc = buf[pos]
        data = buf[pos + 1:pos + 9]
        pos += 9
        start = 0
        for b in range(8):
            if desc >> b & 1:
                out[o] = int.from_bytes(data[start:b + 1], "little")
                start = b + 1
                o += 1
                if o == n:
                    break
    return out


# ---------------------------------------------------------------------------
# QMX (Quantities, Multipliers and eXtractors)
# ---------------------------------------------------------------------------

# per-128-bit-word bit widths and their value capacities (floor(128/w));
# the paper's table without the SIMD-specific 0-width zero-run and
# cross-word 256-value classes (documented simplification — those exist
# to feed 16-lane SSE extractors, which a byte-stream measurement codec
# does not have)
_QMX_WIDTHS = [1, 2, 3, 4, 5, 6, 8, 10, 16, 32]
_QMX_COUNTS = [128 // w for w in _QMX_WIDTHS]


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


def qmx_encode(vals) -> bytes:
    """QMX (Trotman, SIGIR-ADCS 2014: "Compression, SIMD, and Postings
    Lists"): data packs into 128-bit words, every value in a word at one
    bit width; a separate selector byte stream stores
    (width_class << 4) | (run_length - 1) for runs of up to 16
    consecutive words sharing a width. Layout: varint(selector_count) +
    selectors + 16-byte data words."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) and (vals.min() < 0 or vals.max() > 0xFFFFFFFF):
        raise ValueError("qmx needs 0 <= v < 2^32")
    sels = bytearray()
    data = bytearray()
    i, n = 0, len(vals)
    run_w, run_len = -1, 0

    def flush_run():
        nonlocal run_w, run_len
        while run_len > 0:
            take = min(16, run_len)
            sels.append((run_w << 4) | (take - 1))
            run_len -= take
        run_w = -1

    while i < n:
        for wi, (w, cnt) in enumerate(zip(_QMX_WIDTHS, _QMX_COUNTS)):
            chunk = vals[i:i + cnt]
            if int(chunk.max()) < (1 << w):
                word = 0
                for j, v in enumerate(chunk):
                    word |= int(v) << (j * w)
                data += word.to_bytes(16, "little")
                if wi == run_w:
                    run_len += 1
                else:
                    flush_run()
                    run_w, run_len = wi, 1
                i += len(chunk)
                break
        else:  # pragma: no cover - width 32 always fits u32
            raise AssertionError("no qmx width fits")
    flush_run()
    head = bytearray()
    _write_varint(head, len(sels))
    return bytes(head) + bytes(sels) + bytes(data)


def qmx_decode(buf: bytes, n: int) -> np.ndarray:
    nsel, pos = _read_varint(buf, 0)
    sels = buf[pos:pos + nsel]
    dpos = pos + nsel
    out = np.empty(n, dtype=np.int64)
    o = 0
    for s in sels:
        wi, run = s >> 4, (s & 15) + 1
        w, cnt = _QMX_WIDTHS[wi], _QMX_COUNTS[wi]
        mask = (1 << w) - 1
        for _ in range(run):
            word = int.from_bytes(buf[dpos:dpos + 16], "little")
            dpos += 16
            take = min(cnt, n - o)
            for j in range(take):
                out[o + j] = (word >> (j * w)) & mask
            o += take
    return out


# ---------------------------------------------------------------------------
# OptPFor (OPT-PFD)
# ---------------------------------------------------------------------------

_PFOR_BLOCK = 128


def _pfor_block_cost(vals: np.ndarray, b: int) -> int:
    """Encoded bytes for one block at width b: ceil(len*b/8) slot bytes
    + per-exception (1 position byte + varint remainder)."""
    size = (len(vals) * b + 7) // 8
    if b >= 32:
        return size
    exc = vals[vals >= (1 << b)]
    size += len(exc)
    for v in exc:
        r = int(v) >> b
        size += max(1, (r.bit_length() + 6) // 7)
    return size


def _varint_bytes(x: int) -> bytes:
    out = bytearray()
    while True:
        bb = x & 0x7F
        x >>= 7
        if x:
            out.append(bb | 0x80)
        else:
            out.append(bb)
            return bytes(out)


def optpfor_encode(vals) -> bytes:
    """Per 128-int block: header (b, n_exceptions, n_vals), n_vals b-bit
    low slots, exception positions (1 byte each), exception remainders
    (varint each). b chosen per block to minimize encoded size — the
    OPT-PFD rule."""
    vals = np.asarray(vals, dtype=np.int64)
    if len(vals) and (vals.min() < 0 or vals.max() > 0xFFFFFFFF):
        raise ValueError("optpfor needs 0 <= v < 2^32")
    out = bytearray()
    for lo in range(0, len(vals), _PFOR_BLOCK):
        blk = vals[lo:lo + _PFOR_BLOCK]
        maxb = int(blk.max()).bit_length() if len(blk) else 0
        best_b, best_c = maxb, _pfor_block_cost(blk, maxb)
        for b in range(maxb):
            c = _pfor_block_cost(blk, b)
            if c < best_c:
                best_b, best_c = b, c
        b = best_b
        exc_pos = np.nonzero(blk >= (1 << b))[0] if b < 32 else \
            np.empty(0, dtype=np.int64)
        out.append(b)
        out.append(len(exc_pos))
        # b-bit slots, LSB-first packed
        cur, fill = 0, 0
        for v in blk:
            cur |= (int(v) & ((1 << b) - 1)) << fill
            fill += b
            while fill >= 8:
                out.append(cur & 0xFF)
                cur >>= 8
                fill -= 8
        if fill:
            out.append(cur & 0xFF)
        for p in exc_pos:
            out.append(int(p))
        for p in exc_pos:
            out += _varint_bytes(int(blk[p]) >> b)
    return bytes(out)


def optpfor_decode(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    o, pos = 0, 0
    while o < n:
        b, nexc = buf[pos], buf[pos + 1]
        cnt = min(_PFOR_BLOCK, n - o)
        pos += 2
        slot_bytes = (cnt * b + 7) // 8
        cur = int.from_bytes(buf[pos:pos + slot_bytes], "little")
        pos += slot_bytes
        mask = (1 << b) - 1
        for i in range(cnt):
            out[o + i] = cur & mask
            cur >>= b
        exc_pos = buf[pos:pos + nexc]
        pos += nexc
        for p in exc_pos:
            r, shift = 0, 0
            while True:
                byte = buf[pos]
                pos += 1
                r |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            out[o + p] |= r << b
        o += cnt
    return out


CODECS = {
    "simple16": (simple16_encode, simple16_decode),
    "qmx": (qmx_encode, qmx_decode),
    "streamvbyte": (streamvbyte_encode, streamvbyte_decode),
    "varintg8iu": (varintg8iu_encode, varintg8iu_decode),
    "optpfor": (optpfor_encode, optpfor_decode),
}
"""name -> (encode, decode); decode takes (buf, n) — the value count is
external, ds2i's block-decoder convention (list headers are shared
across codecs and not charged to any codec's measured payload)."""

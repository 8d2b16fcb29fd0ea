"""Pattern-statistics collection + dictionary learning as Spark jobs.

The reference's single-threaded hash map pass
(include/dint/block_statistics.hpp:45-109, statistics_collectors.hpp:82-119)
becomes: mapInPandas over postings emitting partially-aggregated
(stream, sel, pattern, size, freq) rows -> Catalyst hash aggregation -> cost
filter -> TakeOrderedAndProject top-(65536-7) -> tiny driver collect that
materializes the broadcastable dictionary.

For each list, the docs stream is delta-gapped (d[i]-d[i-1]-1) and the freqs
stream is (f-1); aligned windows of sizes 16/8/4/2/1 are counted (per-size
tails ignored), matching the reference's "adjusted" collector. In the
multi-dictionary variant, windows are accumulated per 256-int block under
the block's selector class (bit-width of the block max, ref
statistics_collectors.hpp:21-40), and one dictionary is built per mapped
context (ref block_statistics.hpp:171-359).

Pattern selection: DSF (reference default) or PDF (paper variant), see
dictionary.SELECTORS.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.dint.codec import BLOCK_SIZE, NUM_ENTRIES, RESERVED, TARGET_SIZES
from dint_spark.dint.dictionary import (
    CODEWORD_BITS,
    EPS,
    INITIAL_BPI,
    NUM_SELECTOR_CLASSES,
    SELECTORS,
    DintDictionary,
    MultiDictionary,
    default_class_map,
    selector_class,
)

STATS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("sel", T.IntegerType(), False),
        T.StructField("pattern", T.BinaryType(), False),
        T.StructField("size", T.IntegerType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


# u64-packing bit budget per window size: windows whose values ALL fit the
# budget sort as numeric u64 keys (np.unique numeric sort ~5-15x faster than
# the memcmp sort over void blobs); the rest fall back to void. Whether a
# window packs depends only on its own values, so a given pattern always
# lands in the same (packed | void) class in every task and the downstream
# groupBy still merges exact counts.
_PACK_BITS = {4: 16, 8: 8, 16: 4}


def _unpack_keys(keys: np.ndarray, s: int, bits: int) -> np.ndarray:
    """u64 keys -> (n, s) u32 windows (exact inverse of _pack_windows)."""
    k = np.ascontiguousarray(keys, dtype="<u8")
    if bits == 16:
        return k.view("<u2").reshape(-1, s).astype("<u4")
    if bits == 8:
        return k.view("<u1").reshape(-1, s).astype("<u4")
    b = k.view("<u1").reshape(-1, s // 2)
    out = np.empty((len(k), s), dtype="<u4")
    out[:, 0::2] = b & 0xF
    out[:, 1::2] = b >> 4
    return out


def _window_blobs(vals: np.ndarray, pend: dict, sel: int) -> None:
    """Append the aligned windows of each target size to the pending
    per-(sel,size) arrays — no per-window (or per-list) python work beyond
    a reshape+view. Sizes 1/2 stay numeric (<u4 / <u8); sizes 4/8/16 are
    buffered as void blobs here and split into u64-packed numeric keys at
    batch-merge time (_merge_pending), where the fits test amortizes over
    the whole batch instead of running per posting list."""
    m = len(vals)
    vals = np.ascontiguousarray(vals, dtype="<u4")
    for s in TARGET_SIZES:
        nwin = m // s
        if nwin == 0:
            continue
        w = vals[: nwin * s].reshape(nwin, s)
        if s == 1:
            blobs = w.ravel()
        elif s == 2:
            blobs = w.view("<u8").ravel()
        else:
            blobs = w.view(f"V{4 * s}").ravel()
        pend.setdefault((sel, s), []).append(blobs)


def _collect_stream(vals: np.ndarray, pend: dict, per_block: bool) -> None:
    if not per_block:
        _window_blobs(vals, pend, 0)
        return
    for lo in range(0, len(vals), BLOCK_SIZE):
        block = vals[lo: lo + BLOCK_SIZE]
        sel = selector_class(int(block.max())) if len(block) else 0
        _window_blobs(block, pend, sel)


def _acc_unique(acc: dict, key, blobs: np.ndarray) -> None:
    uniq, counts = np.unique(blobs, return_counts=True)
    ulist, clist = acc.setdefault(key, ([], []))
    ulist.append(uniq)
    clist.append(counts)


def _merge_pending(pend: dict, acc: dict) -> int:
    """One np.unique per (sel,size,kind) over the batch's windows, appended
    to the per-task (uniq, counts) buffers — fully vectorized, no per-pattern
    python loop (measured: the python dict accumulation dominated the
    stats job before Catalyst even saw a row).

    Sizes 4/8/16 split here — once per BATCH — into a u64-packed numeric
    part (all window values fit _PACK_BITS; the vast majority of real
    gap/freq windows) and a void remainder: np.unique's numeric sort is
    5-15x faster than the memcmp sort over void blobs, and the void sizes
    carried ~70% of the unique time despite holding ~25% of the windows.
    Whether a window packs depends only on its own values, so a given
    pattern always lands in the same (packed | void) class in every task
    and the downstream groupBy still merges exact counts.

    Returns buffered entries."""
    buffered = 0
    for (sel, s), lst in pend.items():
        blobs = lst[0] if len(lst) == 1 else np.concatenate(lst)
        bits = _PACK_BITS.get(s)
        if bits is None:
            _acc_unique(acc, (sel, s, "n"), blobs)
        else:
            w = blobs.view("<u4").reshape(-1, s)
            fits = w.max(axis=1) < (1 << bits)
            if fits.all():
                packed, rest = w, None
            elif not fits.any():
                packed, rest = None, w
            else:
                packed, rest = w[fits], w[~fits]
            if packed is not None and len(packed):
                if bits == 16:
                    keys = np.ascontiguousarray(packed.astype("<u2")).view("<u8")
                elif bits == 8:
                    keys = np.ascontiguousarray(packed.astype("<u1")).view("<u8")
                else:  # bits == 4: two values per byte, low nibble first
                    b = packed.astype("<u1")
                    nib = b[:, 0::2] | (b[:, 1::2] << 4)
                    keys = np.ascontiguousarray(nib).view("<u8")
                _acc_unique(acc, (sel, s, "p"), keys.ravel())
            if rest is not None and len(rest):
                _acc_unique(acc, (sel, s, "v"),
                            np.ascontiguousarray(rest).view(f"V{4 * s}").ravel())
    pend.clear()
    for ulist, _ in acc.values():
        buffered += sum(len(u) for u in ulist)
    return buffered


def _compact_acc(acc: dict) -> None:
    """Collapse the buffered per-batch (uniq, counts) pairs of each
    (sel,size) into one pair: re-unique the concatenated uniqs and sum the
    counts through the inverse index (bincount on float64 is exact to
    2^53, far above any task's posting count)."""
    for key, (ulist, clist) in acc.items():
        if len(ulist) <= 1:
            continue
        u = np.concatenate(ulist)
        c = np.concatenate(clist)
        uniq, inv = np.unique(u, return_inverse=True)
        cnt = np.bincount(inv.ravel(), weights=c.astype(np.float64),
                          minlength=len(uniq)).astype(np.int64)
        acc[key] = ([uniq], [cnt])


def _iter_pattern_groups(acc: dict):
    """(sel, size, pattern_bytes_concat, counts) per compacted accumulator
    group; u64-packed keys re-expand to their exact u32 pattern bytes here,
    once per DISTINCT pattern. Shared by the Spark collector and the
    brute-force oracle test (tests/test_codec.py)."""
    for (sel, s, kind), (ulist, clist) in acc.items():
        if not ulist or not len(ulist[0]):
            continue
        uniq, counts = ulist[0], clist[0]
        ub = (_unpack_keys(uniq, s, _PACK_BITS[s]).tobytes()
              if kind == "p" else uniq.tobytes())
        yield sel, s, ub, counts


# buffered distinct entries per task before an in-task compaction pass —
# bounds worker memory on giant partitions while keeping merges vectorized
_COMPACT_THRESHOLD = 8_000_000


def collect_pattern_stats(postings: DataFrame, per_block_contexts: bool = False,
                          with_positions: bool = False) -> DataFrame:
    """-> (stream, sel, pattern, size, freq) partially aggregated per task.

    ``with_positions``: also collect a "pos" stream from the rows' flat
    per-doc-gapped position arrays (positions_to_gaps of the ``poss``
    column) — the third learned dictionary of a positional index."""
    from dint_spark.dint.codec import positions_to_gaps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_docs: dict = {}
        acc_freqs: dict = {}
        acc_pos: dict = {}
        pend_docs: dict = {}
        pend_freqs: dict = {}
        pend_pos: dict = {}
        for pdf in batches:
            poss_col = pdf["poss"] if with_positions else None
            for i, (docs, freqs) in enumerate(zip(pdf["doc_ids"],
                                                  pdf["freqs"])):
                docs = np.asarray(docs, dtype=np.int64)
                gaps = np.diff(docs, prepend=-1) - 1
                _collect_stream(gaps.astype(np.uint32), pend_docs,
                                per_block_contexts)
                fvals = np.asarray(freqs, dtype=np.int64) - 1
                _collect_stream(fvals.astype(np.uint32), pend_freqs,
                                per_block_contexts)
                if poss_col is not None:
                    pvals = positions_to_gaps(
                        np.asarray(poss_col.iloc[i], dtype=np.int64),
                        fvals + 1)
                    _collect_stream(pvals.astype(np.uint32), pend_pos,
                                    per_block_contexts)
            # unique once per Arrow batch: bounds pending-buffer memory
            # while amortizing np.unique over thousands of lists
            n = _merge_pending(pend_docs, acc_docs)
            n += _merge_pending(pend_freqs, acc_freqs)
            if with_positions:
                n += _merge_pending(pend_pos, acc_pos)
            if n > _COMPACT_THRESHOLD:
                _compact_acc(acc_docs)
                _compact_acc(acc_freqs)
                _compact_acc(acc_pos)
        streams = [("docs", acc_docs), ("freqs", acc_freqs)]
        if with_positions:
            streams.append(("pos", acc_pos))
        for stream, acc in streams:
            _compact_acc(acc)
            for sel, s, ub, counts in _iter_pattern_groups(acc):
                uniq_n = len(counts)
                w = 4 * s
                # the only per-pattern python work left in the task: bytes
                # objects for the final distinct patterns of the partition
                pats = [ub[i * w: i * w + w] for i in range(uniq_n)]
                yield pd.DataFrame(
                    {
                        "stream": stream,
                        "sel": np.full(uniq_n, sel, np.int32),
                        "pattern": pats,
                        "size": np.full(uniq_n, s, np.int32),
                        "freq": counts,
                    }
                )

    # the postings checkpoint is term-range-sorted, so head-term files hold
    # orders of magnitude more postings than tail files; without a spread
    # the stats pass is bounded by one straggler task (measured). A random
    # round-robin repartition costs one shuffle of the arrays and makes the
    # python collector embarrassingly parallel.
    spark = postings.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism * 4, 16)
    cols = ["doc_ids", "freqs"] + (["poss"] if with_positions else [])
    return (
        postings.select(*cols)
        .repartition(nparts)
        .mapInPandas(run, schema=STATS_SCHEMA)
    )


def learn_dictionaries(
    postings: DataFrame,
    selection: str = "dsf",
    variant: str = "single",
    num_dicts: int = 2,
    total_integers: int | None = None,
    sample_mod: int = 1,
    with_positions: bool = False,
) -> tuple:
    """Run the stats job + pattern selection; returns (docs_dict, freqs_dict,
    info). One Spark action; everything after the top-k collect is driver-
    side on <= 2*K*65529 tiny rows.

    ``total_integers`` (the cost-filter denominator) is observed on the
    postings write by build_index; passing it here skips a full extra scan
    of the postings checkpoint.

    ``sample_mod`` > 1 collects pattern statistics from a deterministic
    1/sample_mod sample of posting LISTS (hash(term_id, seg_id) — whole
    rows, so gap patterns stay intact). The reference scans everything
    (block_statistics.hpp:45-109), and sample_mod=1 keeps that parity; at
    10^12 docs the stats pass is the only remaining full-data shuffle in
    the build, and pattern frequencies are statistical — a 1/64 sample
    learns a near-identical dictionary while the cost filter's
    total_integers shrinks by the same factor (the eps threshold is
    relative, dictionary_builders.hpp:15-38). Decode correctness never
    depends on WHICH dictionary was learned (round-trip is exact for any
    dict), so this trades only compression ratio, not correctness."""
    multi = variant == "multi"
    sampled = postings
    if sample_mod > 1:
        sampled = postings.where(
            F.pmod(F.hash("term_id", "seg_id"), F.lit(sample_mod)) == 0)
        total_integers = None  # threshold must reflect the sampled totals
    if total_integers is None:
        total_integers = sampled.select(
            F.sum(F.size("doc_ids")).alias("t")
        ).collect()[0]["t"] or 0

    stats = (
        collect_pattern_stats(sampled, per_block_contexts=multi,
                              with_positions=with_positions)
        .groupBy("stream", "sel", "pattern", "size")
        .agg(F.sum("freq").alias("freq"))
    )

    # cost filter: keep iff saving > eps/1000, singletons always kept
    # (ref dictionary_builders.hpp:15-38, block_statistics.hpp:87-99)
    thr = (EPS / 1000) * float(max(total_integers, 1))
    saving = F.col("freq") * (
        F.lit(INITIAL_BPI) * F.col("size") - F.lit(CODEWORD_BITS)
    )
    # persist: the per-stream (and per-context) top-k collects below would
    # otherwise re-run the whole stats scan once each
    filtered = stats.where(
        (F.col("size") == 1) | (saving > F.lit(thr))
    ).persist()

    max_patterns = NUM_ENTRIES - RESERVED
    select = SELECTORS[selection]
    class_map = default_class_map(num_dicts)
    dicts: dict[str, object] = {}
    stream_names = ("docs", "freqs", "pos") if with_positions \
        else ("docs", "freqs")
    for stream in stream_names:
        if not multi:
            top = (
                filtered.where(F.col("stream") == stream)
                .orderBy(F.desc("freq"), F.desc("size"), F.asc("pattern"))
                .limit(max_patterns * 2 if selection == "pdf" else max_patterns)
                .collect()
            )
            rows = [(r["pattern"], r["size"], r["freq"]) for r in top]
            dicts[stream] = DintDictionary.build(
                select(rows, total_integers, max_patterns=max_patterns)
            )
        else:
            sub_dicts = []
            for di in range(num_dicts):
                sels = [c for c in range(NUM_SELECTOR_CLASSES)
                        if class_map[c] == di]
                top = (
                    filtered.where(
                        (F.col("stream") == stream) & F.col("sel").isin(sels)
                    )
                    .groupBy("pattern", "size")
                    .agg(F.sum("freq").alias("freq"))
                    .orderBy(F.desc("freq"), F.desc("size"), F.asc("pattern"))
                    .limit(max_patterns * 2 if selection == "pdf" else max_patterns)
                    .collect()
                )
                rows = [(r["pattern"], r["size"], r["freq"]) for r in top]
                sub_dicts.append(
                    DintDictionary.build(
                        select(rows, total_integers, max_patterns=max_patterns)
                    )
                )
            dicts[stream] = MultiDictionary(dicts=sub_dicts,
                                            class_map=class_map)

    filtered.unpersist()
    info = {
        "total_integers": int(total_integers),
        "variant": variant,
        "selection": selection,
        "stats_sample_mod": int(sample_mod),
    }
    if with_positions:
        return dicts["docs"], dicts["freqs"], dicts["pos"], info
    return dicts["docs"], dicts["freqs"], info

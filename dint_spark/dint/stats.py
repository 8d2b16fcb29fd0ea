"""Pattern-statistics collection + DSF dictionary learning as Spark jobs.

The reference's single-threaded hash map pass
(include/dint/block_statistics.hpp:45-109, statistics_collectors.hpp:82-119)
becomes: mapInPandas over postings emitting partially-aggregated
(stream, pattern, size, freq) rows -> Catalyst hash aggregation -> cost
filter -> TakeOrderedAndProject top-(65536-7) -> tiny driver collect that
materializes the broadcastable dictionary.

For each list, the docs stream is delta-gapped (d[i]-d[i-1]-1) and the freqs
stream is (f-1); aligned windows of sizes 16/8/4/2/1 are counted (per-size
tails ignored), matching the reference's "adjusted" collector.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.dint.codec import NUM_ENTRIES, RESERVED, TARGET_SIZES
from dint_spark.dint.dictionary import CODEWORD_BITS, EPS, INITIAL_BPI, DintDictionary

STATS_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("pattern", T.BinaryType(), False),
        T.StructField("size", T.IntegerType(), False),
        T.StructField("freq", T.LongType(), False),
    ]
)


def _collect_windows(vals: np.ndarray, acc: dict) -> None:
    """Count aligned windows of each target size over one stream."""
    m = len(vals)
    vals = np.ascontiguousarray(vals, dtype="<u4")
    for s in TARGET_SIZES:
        nwin = m // s
        if nwin == 0:
            continue
        windows = vals[: nwin * s].reshape(nwin, s)
        # void view -> one comparable blob per window, then C-speed unique
        blobs = windows.view(f"V{4 * s}").ravel()
        uniq, counts = np.unique(blobs, return_counts=True)
        ub = uniq.tobytes()
        w = 4 * s
        for i, cnt in enumerate(counts):
            key = ub[i * w: (i + 1) * w]
            k2 = (key, s)
            acc[k2] = acc.get(k2, 0) + int(cnt)


def collect_pattern_stats(postings: DataFrame) -> DataFrame:
    """-> (stream, pattern, size, freq) partially aggregated per task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_docs: dict = {}
        acc_freqs: dict = {}
        for pdf in batches:
            for docs, freqs in zip(pdf["doc_ids"], pdf["freqs"]):
                docs = np.asarray(docs, dtype=np.int64)
                gaps = np.diff(docs, prepend=-1) - 1
                _collect_windows(gaps.astype(np.uint32), acc_docs)
                fvals = np.asarray(freqs, dtype=np.int64) - 1
                _collect_windows(fvals.astype(np.uint32), acc_freqs)
        rows = []
        for stream, acc in (("docs", acc_docs), ("freqs", acc_freqs)):
            for (pat, size), freq in acc.items():
                rows.append((stream, pat, size, freq))
        if rows:
            yield pd.DataFrame(rows, columns=["stream", "pattern", "size", "freq"])

    return postings.select("doc_ids", "freqs").mapInPandas(run, schema=STATS_SCHEMA)


def learn_dictionaries(
    postings: DataFrame, optimal_filter: bool = True
) -> tuple[DintDictionary, DintDictionary, dict]:
    """Run the stats job + DSF selection; returns (docs_dict, freqs_dict,
    info). One Spark action; everything after the top-k collect is driver-
    side on <= 2*65529 tiny rows."""
    total_integers = postings.select(
        F.sum(F.size("doc_ids")).alias("t")
    ).collect()[0]["t"] or 0

    stats = (
        collect_pattern_stats(postings)
        .groupBy("stream", "pattern", "size")
        .agg(F.sum("freq").alias("freq"))
    )

    # cost filter: keep iff saving > eps/1000, singletons always kept
    # (ref dictionary_builders.hpp:15-38, block_statistics.hpp:87-99)
    thr = (EPS / 1000) * float(max(total_integers, 1))
    saving = F.col("freq") * (
        F.lit(INITIAL_BPI) * F.col("size") - F.lit(CODEWORD_BITS)
    )
    filtered = stats.where((F.col("size") == 1) | (saving > F.lit(thr)))

    max_patterns = NUM_ENTRIES - RESERVED
    dicts = {}
    for stream in ("docs", "freqs"):
        top = (
            filtered.where(F.col("stream") == stream)
            .orderBy(F.desc("freq"), F.desc("size"), F.asc("pattern"))
            .limit(max_patterns)
            .collect()
        )
        dicts[stream] = DintDictionary.build([r["pattern"] for r in top])

    info = {
        "total_integers": int(total_integers),
        "docs_dict_entries": dicts["docs"].num_used,
        "freqs_dict_entries": dicts["freqs"].num_used,
    }
    return dicts["docs"], dicts["freqs"], info

"""Spark-free decode profile: single-threaded kernel rates on the REAL
bench-corpus index segments (same corpus mix as bench.py, seed 42).

Builds (or reuses) the bench index, collects its encoded segments to the
driver, then times — with no Spark machinery at all —
  - decode_short_lists_batch over the single-block BIC lists (the mixed
    corpus's count-dominant path), and
  - decode_list_bulk over the multi-block DINT lists (the volume-dominant
    path),
reporting per-path and blended ints/sec for ONE core. Comparing this to
BENCH.md's committed kernel rates separates a real kernel regression from
host-window noise or Spark-side (scheduler/Arrow) overhead in the
decode_full_index wall time.

Usage: python scripts/decode_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dint_spark.session import get_spark  # noqa: E402
from dint_spark.corpus import generate_pages, pages_from_documents  # noqa: E402
from dint_spark.index import IndexConfig, build_index, load_index  # noqa: E402
from dint_spark.dint.codec import (  # noqa: E402
    BLOCK_SIZE, decode_list_bulk, decode_short_lists_batch)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = "/tmp/dint_spark_decode_profile"
    spark = get_spark("decode_profile", master="local[16]",
                      shuffle_partitions=16)
    try:
        idx = load_index(spark, out_dir)
    except Exception:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        pages = pages_from_documents(docs).unionByName(
            generate_pages(spark, 10_000, seed=42))
        idx = build_index(spark, pages, out_dir,
                          IndexConfig(num_buckets=8, input_tag="decode-prof"))
    dd, fd = idx.docs_dict, idx.freqs_dict
    pdf = idx.segments.select(
        "n", "block_maxs", "endpoints", "freq_offsets", "payload").toPandas()
    spark.stop()  # single-threaded timing from here

    ns = pdf["n"].to_numpy()
    sm = ns < BLOCK_SIZE
    short = pdf[sm]
    long_ = pdf[~sm]

    # ---- short-list path: one multi-list lockstep BIC decode ----
    payloads = [bytes(p) for p in short["payload"]]
    s_ns = short["n"].to_numpy().astype(np.int64)
    # single-block lists: last docid = block_maxs[0], freq stream start =
    # freq_offsets[0] (same derivation as queries._ShortListBuffer.add)
    lasts = np.asarray([int(b[0]) for b in short["block_maxs"]],
                       dtype=np.int64)
    fstarts = np.asarray([int(fo[0]) for fo in short["freq_offsets"]],
                         dtype=np.int64)
    decode_short_lists_batch(payloads, s_ns, lasts, fstarts)  # warmup
    t_short = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        decode_short_lists_batch(payloads, s_ns, lasts, fstarts)
        t_short = min(t_short, time.perf_counter() - t0)
    short_ints = 2 * int(s_ns.sum())

    # ---- long-list path: per-list bulk cross-block decode ----
    rows = [(bytes(r.payload), int(r.n),
             np.asarray(r.block_maxs, dtype=np.int64),
             np.asarray(r.endpoints, dtype=np.int64),
             np.asarray(r.freq_offsets, dtype=np.int64))
            for r in long_.itertuples()]
    for p, n, bm, ep, fo in rows[:8]:  # warmup
        decode_list_bulk(p, n, bm, ep, fo, dd, fd)
    t_long = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for p, n, bm, ep, fo in rows:
            decode_list_bulk(p, n, bm, ep, fo, dd, fd)
        t_long = min(t_long, time.perf_counter() - t0)
    long_ints = 2 * int(long_["n"].sum())

    print(json.dumps({
        "short_lists": int(sm.sum()),
        "short_ints": short_ints,
        "short_sec": round(t_short, 4),
        "short_ints_per_sec": round(short_ints / t_short),
        "long_lists": int((~sm).sum()),
        "long_ints": long_ints,
        "long_sec": round(t_long, 4),
        "long_ints_per_sec": round(long_ints / t_long),
        "blended_ints_per_sec": round(
            (short_ints + long_ints) / (t_short + t_long)),
    }))


if __name__ == "__main__":
    main()

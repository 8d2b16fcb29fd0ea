"""A/B encode-throughput comparison: per-list encode_list vs the batched
encode_lists_batch, single-threaded, on the REAL bench-corpus posting
lists (sf0.1 documents + synthetic Zipfian pages, seed 42 — exactly
bench.py's mix).

Builds (or resumes) the bench index once to obtain its postings
checkpoint and learned dictionaries, loads the posting lists into the
driver, and times both encoders over identical inputs. Verifies byte
identity while at it. This isolates the encode kernels from Spark job
machinery, the same protocol as the decode-rate A/B recorded in BENCH.md.

Usage: python scripts/encode_ab.py [sf_dir]
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
from dint_spark.index import IndexConfig, build_index  # noqa: E402
from dint_spark.dint.codec import encode_list, encode_lists_batch  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("encode_ab", master="local[16]", shuffle_partitions=16)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = pages_from_documents(docs).unionByName(
        generate_pages(spark, 10_000, seed=42))
    out_dir = "/tmp/dint_spark_encode_ab"
    idx = build_index(spark, pages, out_dir,
                      IndexConfig(num_buckets=8, input_tag="encode-ab"))
    dd, fd = idx.docs_dict, idx.freqs_dict

    # the encode UDF's real input: per-(term, seg) doc_ids + freqs rows
    pdf = (spark.read.parquet(os.path.join(out_dir, "postings.parquet"))
           .select("term_id", "doc_ids", "freqs").toPandas())
    docs_arrs = [np.asarray(d, dtype=np.int64) for d in pdf["doc_ids"]]
    freqs_arrs = [np.asarray(f, dtype=np.int64) for f in pdf["freqs"]]
    total = int(sum(len(d) for d in docs_arrs))
    spark.stop()  # single-threaded timing from here

    # warmup (JIT-free python, but touches pages + builds lookup tables)
    encode_lists_batch(docs_arrs[:64], freqs_arrs[:64], dd, fd)
    [encode_list(d, f, dd, fd) for d, f in
     zip(docs_arrs[:64], freqs_arrs[:64])]

    t_seq = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        refs = [encode_list(d, f, dd, fd)
                for d, f in zip(docs_arrs, freqs_arrs)]
        t_seq = min(t_seq, time.perf_counter() - t0)
    t_bat = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = encode_lists_batch(docs_arrs, freqs_arrs, dd, fd)
        t_bat = min(t_bat, time.perf_counter() - t0)

    mismatch = sum(1 for r, o in zip(refs, outs) if r[0] != o[0])
    print(json.dumps({
        "lists": len(docs_arrs),
        "postings": total,
        "byte_mismatches": mismatch,
        "seq_sec": round(t_seq, 3),
        "batch_sec": round(t_bat, 3),
        "seq_ints_per_sec": round(2 * total / t_seq),
        "batch_ints_per_sec": round(2 * total / t_bat),
        "speedup": round(t_seq / t_bat, 2),
    }))


if __name__ == "__main__":
    main()

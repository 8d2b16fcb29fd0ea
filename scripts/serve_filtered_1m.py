"""Filtered serving at 1M docs (round-3 DocMask protocol): pin the cached
gate index once, then serve the same 2000-query BMW-vec batch unfiltered
and with a ~50%-selective metadata DocMask (doclen >= corpus median), on
the SAME server in the same window — the delta is the bitmap-mask cost of
queries.DocMask on the dense-accumulator kernels, directly comparable to
the tombstone-mask row in BENCH.md ("Deletes + compaction at 1M docs").

Also verifies zero mask leaks across all result rows and reports the
filter-build wall (distributed packbits -> 125 KB/M-doc bitmap collect).

Usage: python scripts/serve_filtered_1m.py [index_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    idx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate1m_idx_1000000"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import numpy as np
    import pyspark.sql.functions as F

    from bench import host_health_probe, make_query_workload
    from dint_spark.index import load_index
    from dint_spark.queries import BroadcastQueryServer, build_doc_filter
    from dint_spark.session import get_spark

    health_start = host_health_probe()
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = (f"local-cluster[{min(2, n_cpus // 8)},8,16384]"
              if n_cpus >= 16 else f"local[{n_cpus}]")
    spark = get_spark("serve_filtered_1m", master=master,
                      shuffle_partitions=max(32, n_cpus),
                      extra_conf={
                          "spark.executorEnv.DINT_SPARK_DECODE_CACHE_MB":
                              "1024",
                      })

    idx = load_index(spark, idx_dir)
    vocab_pdf = idx.vocab().select("term_id", "df").toPandas()
    queries = make_query_workload(vocab_pdf, n_q, 43)

    # ~50%-selective metadata predicate: doclen >= corpus median
    dl = spark.read.parquet(os.path.join(idx_dir, "doclens.parquet"))
    median = int(dl.approxQuantile("len", [0.5], 0.001)[0])
    t0 = time.time()
    dm = build_doc_filter(spark, dl.filter(F.col("len") >= median),
                          idx.num_docs)
    t_filter = time.time() - t0
    selectivity = float(dm.mask.mean())

    t0 = time.time()
    server = BroadcastQueryServer(spark, idx, max_broadcast_bytes=1 << 31)
    t_pin = time.time() - t0

    # wave 1 pays per-worker decode of the hot set; steady state after
    server.serve(queries, algo="block_max_wand_vec", k=10).count()

    def best_of(n, doc_filter=None):
        walls, last = [], None
        for _ in range(n):
            t0 = time.time()
            last = server.serve(queries, algo="block_max_wand_vec", k=10,
                                doc_filter=doc_filter).toPandas()
            walls.append(round(time.time() - t0, 3))
        return walls, last

    walls_unf, _ = best_of(3)
    walls_filt, res = best_of(3, doc_filter=dm)
    leaks = int((~dm.mask[res["doc_id"].to_numpy()]).sum())

    print(json.dumps({
        "index_dir": idx_dir, "num_docs": idx.num_docs, "n_queries": n_q,
        "master": master, "pin_s": round(t_pin, 2),
        "filter_build_s": round(t_filter, 2),
        "filter_selectivity": round(selectivity, 4),
        "filter_bitmap_bytes": int(dm.packed.nbytes),
        "median_len": median,
        "serve_walls_unfiltered_s": walls_unf,
        "serve_walls_filtered_s": walls_filt,
        "q_per_s_unfiltered": round(n_q / min(walls_unf), 1),
        "q_per_s_filtered": round(n_q / min(walls_filt), 1),
        "mask_leaks": leaks,
        "result_rows": int(len(res)),
        "host_health": {"start": health_start, "end": host_health_probe()},
    }, indent=1))
    assert leaks == 0, "DocMask leaked excluded docs"
    spark.stop()


if __name__ == "__main__":
    main()

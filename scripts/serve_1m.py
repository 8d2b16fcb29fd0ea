"""1M-doc served-query reference (BENCH round-3 protocol): pin the cached
gate index (92.6M postings) in a BroadcastQueryServer and serve 2000
mixed-df BMW-vec batches, best-of-3, with host probes at both ends.

The decode-LRU budget is propagated to the python workers via
spark.executorEnv — at this corpus the hot decoded set is ~740 MB, and the
kernel (not scheduling) is the wall, so the cache budget is the knob that
decides whether a worker decodes each head list once per process or once
per query wave. Memory math: budget x python workers per executor
(= executor cores) bounds the per-executor transient; 1 GiB x 8 cores =
8 GiB/executor here, the same order as the pinned seg broadcast.

Usage: python scripts/serve_1m.py [index_dir] [n_queries] [cache_mb]
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
    cache_mb = sys.argv[3] if len(sys.argv) > 3 else "1024"

    from bench import host_health_probe, make_query_workload
    from dint_spark.index import load_index
    from dint_spark.queries import BroadcastQueryServer
    from dint_spark.session import get_spark

    health_start = host_health_probe()

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = (f"local-cluster[{min(2, n_cpus // 8)},8,16384]"
              if n_cpus >= 16 else f"local[{n_cpus}]")
    spark = get_spark("serve_1m", master=master,
                      shuffle_partitions=max(32, n_cpus),
                      extra_conf={
                          "spark.executorEnv.DINT_SPARK_DECODE_CACHE_MB":
                              cache_mb,
                      })

    idx = load_index(spark, idx_dir)
    vocab_pdf = idx.vocab().select("term_id", "df").toPandas()
    queries = make_query_workload(vocab_pdf, n_q, 43)

    t0 = time.time()
    server = BroadcastQueryServer(spark, idx,
                                  max_broadcast_bytes=1 << 31)
    t_pin = time.time() - t0

    # wave 1 pays the per-worker decode of the hot set; steady state after
    server.serve(queries, algo="block_max_wand_vec", k=10).count()
    walls = []
    for _ in range(3):
        t0 = time.time()
        n_rows = server.serve(queries, algo="block_max_wand_vec",
                              k=10).count()
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({
        "index_dir": idx_dir, "num_docs": idx.num_docs,
        "n_queries": n_q, "cache_mb": int(cache_mb),
        "master": master, "pin_s": round(t_pin, 2),
        "serve_walls_s": walls,
        "q_per_s": round(n_q / min(walls), 1),
        "result_rows": int(n_rows),
        "host_health": {"start": health_start, "end": host_health_probe()},
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

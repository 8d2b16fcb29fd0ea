"""Example cluster job for spark-submit --py-files (north rule: "run via
spark-submit --py-files on a multi-executor cluster at two cluster sizes").

The job imports dint_spark ONLY from the shipped --py-files zip (executors
zipimport it; the driver gets it on sys.path from spark-submit), builds an
index over a deterministic corpus, runs a BM25 batch, and prints one JSON
line with throughput — the artifact a cluster operator records at N and 4N
executors to evidence the scaling rule.

Usage (sandbox stand-in shown; on a real cluster swap the master for YARN/
K8s and pass real executor counts):

    python scripts/make_pyfiles_zip.py /tmp/dint_spark.zip
    spark-submit --master local-cluster[2,2,2048] \
        --py-files /tmp/dint_spark.zip \
        --conf spark.python.daemon.module=dint_spark.daemon \
        --conf spark.executorEnv.PYTHONPATH=/tmp/dint_spark.zip \
        scripts/submit_job.py 20000 /tmp/dint_submit_idx

NOTE the executorEnv.PYTHONPATH line: --py-files alone reaches worker
sys.path only AFTER the python daemon has started, so a CUSTOM daemon
module (spark.python.daemon.module) must be importable from the raw
executor environment — point executorEnv.PYTHONPATH at the shipped zip
(on YARN/K8s the zip materializes in the executor working dir, so the
relative form `--conf spark.executorEnv.PYTHONPATH=dint_spark.zip`
works). Omit both daemon confs and the job still runs — the daemon is a
worker-warmup optimization, not a correctness dependency.

Args: [num_docs] [index_dir] [num_queries]
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dint_submit_idx"
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    # imports AFTER spark-submit has put the --py-files zip on sys.path
    import numpy as np
    from pyspark.sql import SparkSession

    from dint_spark.corpus import generate_pages
    from dint_spark.index import IndexConfig, build_index
    from dint_spark.queries import run_queries

    spark = SparkSession.builder.appName("dint_spark_submit_job").getOrCreate()

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    pages = generate_pages(spark, num_docs, seed=42)
    idx = build_index(spark, pages, out_dir,
                      IndexConfig(num_buckets=4, input_tag="submit-job"))
    build_s = time.time() - t0

    # sort: parquet scan row order is partition-dependent; the query set
    # must be a pure function of the corpus
    vocab = (idx.vocab().select("term_id", "df").toPandas()
             .sort_values("term_id").reset_index(drop=True))
    rng = np.random.default_rng(42)
    p = vocab["df"].to_numpy().astype(float)
    p /= p.sum()
    tids = vocab["term_id"].to_numpy()
    queries = [
        [int(t) for t in rng.choice(tids, size=int(rng.integers(1, 6)), p=p)]
        for _ in range(n_queries)
    ]
    t0 = time.time()
    n_rows = run_queries(spark, idx, queries,
                         algo="block_max_wand_vec", k=10).count()
    query_s = time.time() - t0

    print(json.dumps({
        "metric": "spark-submit job",
        "executors": spark.sparkContext.getConf().get("spark.master"),
        "num_docs": num_docs,
        "build_s": round(build_s, 2),
        "build_docs_per_sec": round(num_docs / build_s, 1),
        "queries": n_queries,
        "qps": round(n_queries / query_s, 1),
        "result_rows": n_rows,
        "docs_bpi": idx.metrics().get("docs_bpi"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

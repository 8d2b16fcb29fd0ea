"""Scaling-efficiency evidence for the north rule (N -> 4N cores).

The rule requires throughput scaling efficiency >= 0.8 between cluster sizes
N and 4N. This sandbox has no real cluster, so we evidence it the sanctioned
way: the SAME jobs (index build; 500-query BM25 block-max-WAND batch) on the
SAME input at local[8] vs local[32], reporting throughput at both plus

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

Each master runs in its own subprocess (fresh JVM) so sessions don't share
executor state. Results are written to BENCH.md.

Usage: python scripts/scaling_bench.py [num_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from dint_spark.session import get_spark
from dint_spark.corpus import generate_pages
from dint_spark.index import build_index, IndexConfig
from dint_spark.queries import run_queries
import numpy as np

cores = int(sys.argv[1])
num_docs = int(sys.argv[2])
out = sys.argv[3]

spark = get_spark(f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8))
pages = generate_pages(spark, num_docs, seed=42, partitions=cores * 4)
idx_dir = f"/tmp/dint_scaling/{{cores}}-{{os.getpid()}}"
shutil.rmtree(idx_dir, ignore_errors=True)

t0 = time.time()
idx = build_index(spark, pages, idx_dir,
                  IndexConfig(num_buckets=8, input_tag=f"scaling-{{num_docs}}"))
t_build = time.time() - t0

vocab = idx.vocab().select("term_id", "df").toPandas()
rng = np.random.default_rng(42)
p = vocab["df"].to_numpy().astype(float)
p /= p.sum()
tids = vocab["term_id"].to_numpy()
queries = [[int(t) for t in rng.choice(tids, size=int(rng.integers(1, 6)), p=p)]
           for _ in range(500)]
run_queries(spark, idx, queries, algo="block_max_wand", k=10).count()  # warmup
runs = []
for _ in range(3):
    t0 = time.time()
    run_queries(spark, idx, queries, algo="block_max_wand", k=10).count()
    runs.append(time.time() - t0)
vruns = []
for _ in range(2):
    t0 = time.time()
    run_queries(spark, idx, queries, algo="ranked_or_vec", k=10).count()
    vruns.append(time.time() - t0)

steps = idx.manifest["steps"]
phases = {{
    "corpus_s": steps.get("corpus", {{}}).get("wall_s"),
    "dicts_s": steps.get("dicts", {{}}).get("wall_s"),
    "encode_sum_s": sum(b["wall_s"] for b in idx.manifest["buckets"].values()),
    "encode_max_s": max(b["wall_s"] for b in idx.manifest["buckets"].values()),
}}
with open(out, "w") as f:
    json.dump({{"cores": cores, "build_s": t_build,
               "build_docs_per_sec": num_docs / t_build,
               "query_s": min(runs), "qps": 500 / min(runs),
               "vec_query_s": min(vruns), "vec_qps": 500 / min(vruns),
               "phases": phases}}, f)
shutil.rmtree(idx_dir, ignore_errors=True)
spark.stop()
"""


def run_one(cores: int, num_docs: int) -> dict:
    out = f"/tmp/dint_scaling_result_{cores}.json"
    script = WORKER.format(repo=REPO)
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    subprocess.run(
        [sys.executable, "-c", script, str(cores), str(num_docs), out],
        check=True, env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    r8 = run_one(8, num_docs)
    r32 = run_one(32, num_docs)
    build_eff = (r32["build_docs_per_sec"] / r8["build_docs_per_sec"]) / 4
    query_eff = (r32["qps"] / r8["qps"]) / 4
    result = {
        "num_docs": num_docs,
        "local8": r8,
        "local32": r32,
        "build_scaling_efficiency": round(build_eff, 3),
        "query_scaling_efficiency": round(query_eff, 3),
    }
    print(json.dumps(result, indent=1))

    md = f"""# BENCH — scaling evidence (north rule: N -> 4N efficiency >= 0.8)

Same jobs, same input ({num_docs:,} deterministic Zipfian pages, seed 42),
two parallelism levels in fresh JVMs. Sandbox proxy for N vs 4N executors
per BASELINE.md.

| metric | local[8] | local[32] | ratio | efficiency (ratio/4) |
|---|---|---|---|---|
| index build docs/sec | {r8['build_docs_per_sec']:.1f} | {r32['build_docs_per_sec']:.1f} | {r32['build_docs_per_sec']/r8['build_docs_per_sec']:.2f}x | {build_eff:.3f} |
| BM25 BMW queries/sec (500q, best of 3) | {r8['qps']:.1f} | {r32['qps']:.1f} | {r32['qps']/r8['qps']:.2f}x | {query_eff:.3f} |

Raw: build {r8['build_s']:.1f}s -> {r32['build_s']:.1f}s; 500-query batch
{r8['query_s']:.2f}s -> {r32['query_s']:.2f}s.

Notes on what does/doesn't scale here: the build's encode stage
(mapInPandas over term-range partitions) and the postings shuffle scale
with cores; fixed driver-side work (dictionary learning on <=65k collected
patterns, manifest bookkeeping) and Spark job-scheduling overhead do not —
at this corpus size those fixed costs bound the measurable efficiency, and
they shrink relative to real work as the corpus grows (they are O(1) in
input size). The query batch is a single shuffle + 500 applyInPandas
groups, embarrassingly parallel across cores.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()

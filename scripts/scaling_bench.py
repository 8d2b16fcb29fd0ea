"""Scaling-efficiency evidence for the north rule (N -> 4N executors).

The rule requires throughput scaling efficiency >= 0.8 between cluster sizes
N and 4N. This sandbox has no physical cluster, so we run Spark's
local-cluster master: N separate executor JVMs of 8 cores / 16 GiB each on
the 32-core host, with real (netty) shuffle between them — the closest
available stand-in for N vs 4N executors. The SAME jobs (index build;
500-query BM25 block-max-WAND-vec batch) run on the SAME input at every
level, each level in a fresh driver subprocess:

    efficiency = (throughput_4N / throughput_N) / 4

Results are written to BENCH.md.

Usage: python scripts/scaling_bench.py [num_docs] [executor counts...]
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

n_exec = int(sys.argv[1])
num_docs = int(sys.argv[2])
out = sys.argv[3]

# N executors x 8 cores each, separate JVMs + python worker pools: the
# faithful sandbox stand-in for "N and 4N executors" (north rule). Same
# per-executor resources at every level.
exec_cores = int(os.environ.get("SCALING_EXEC_CORES", "8"))
exec_mem = int(os.environ.get("SCALING_EXEC_MEM_MB", "16384"))
cores = n_exec * exec_cores
spark = get_spark(f"scaling-{{n_exec}}x{{exec_cores}}",
                  master=f"local-cluster[{{n_exec}},{{exec_cores}},{{exec_mem}}]",
                  shuffle_partitions=max(cores, 8))
pages = generate_pages(spark, num_docs, seed=42, partitions=cores * 4)
idx_dir = f"/tmp/dint_scaling/{{cores}}-{{os.getpid()}}"
shutil.rmtree(idx_dir, ignore_errors=True)

# best-of-N fresh builds (SCALING_BUILD_RUNS, default 1): guards the
# cross-level ratio against a hypervisor degradation window flipping
# mid-series (BENCH.md "Host variance")
build_runs = int(os.environ.get("SCALING_BUILD_RUNS", "1"))
t_build = None
for bi in range(build_runs):
    bdir = idx_dir if bi == build_runs - 1 else f"{{idx_dir}}-b{{bi}}"
    shutil.rmtree(bdir, ignore_errors=True)
    t0 = time.time()
    idx = build_index(spark, pages, bdir,
                      IndexConfig(num_buckets=8, input_tag=f"scaling-{{num_docs}}"))
    tb = time.time() - t0
    if t_build is None or tb < t_build:
        t_build = tb
    if bi != build_runs - 1:
        shutil.rmtree(bdir, ignore_errors=True)

vocab = idx.vocab().select("term_id", "df").toPandas()
rng = np.random.default_rng(42)
p = vocab["df"].to_numpy().astype(float)
p /= p.sum()
tids = vocab["term_id"].to_numpy()
n_queries = int(os.environ.get("SCALING_QUERIES", "2000"))
queries = [[int(t) for t in rng.choice(tids, size=int(rng.integers(1, 6)), p=p)]
           for _ in range(n_queries)]
run_queries(spark, idx, queries, algo="block_max_wand_vec", k=10).count()  # warmup
runs = []
for _ in range(3):
    t0 = time.time()
    run_queries(spark, idx, queries, algo="block_max_wand_vec", k=10).count()
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
# single-core probe recorded PER LEVEL: this sandbox degrades
# intermittently at the hypervisor level, and a level that ran inside a
# degraded window must be readable as such (cf. BENCH.md "Host variance")
t0 = time.time()
acc = 0
for i in range(5_000_000):
    acc += i
cpu_loop_s = round((time.time() - t0) * 2, 3)
with open(out, "w") as f:
    json.dump({{"cores": cores, "build_s": t_build, "cpu_loop_s": cpu_loop_s,
               "build_docs_per_sec": num_docs / t_build,
               "query_s": min(runs), "qps": n_queries / min(runs),
               "vec_query_s": min(vruns), "vec_qps": n_queries / min(vruns),
               "phases": phases}}, f)
shutil.rmtree(idx_dir, ignore_errors=True)
spark.stop()
"""


def run_one(n_exec: int, num_docs: int) -> dict:
    ec = os.environ.get("SCALING_EXEC_CORES", "8")
    out = f"/tmp/dint_scaling_result_{n_exec}x{ec}.json"
    script = WORKER.format(repo=REPO)
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    # tasks run in the executor JVMs; the driver only schedules + collects
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    subprocess.run(
        [sys.executable, "-c", script, str(n_exec), str(num_docs), out],
        check=True, env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    levels = [int(a) for a in sys.argv[2:]] or [1, 2, 4]  # executors (x8 cores)
    results = {n: run_one(n, num_docs) for n in levels}
    nq = int(os.environ.get("SCALING_QUERIES", "2000"))

    def eff(lo, hi, key):
        return (results[hi][key] / results[lo][key]) / (hi / lo)

    pairs = list(zip(levels[:-1], levels[1:]))
    out = {"num_docs": num_docs,
           **{f"local{n}": results[n] for n in levels},
           "efficiency": {
               f"{lo}->{hi}": {
                   "build": round(eff(lo, hi, "build_docs_per_sec"), 3),
                   "bmw_vec_qps": round(eff(lo, hi, "qps"), 3),
                   "ranked_or_vec_qps": round(eff(lo, hi, "vec_qps"), 3),
               } for lo, hi in pairs}}
    print(json.dumps(out, indent=1))

    rows = []
    for key, label in [("build_docs_per_sec", "index build docs/sec"),
                       ("qps", f"BM25 BMW-vec queries/sec ({nq}q, best of 3)"),
                       ("vec_qps", "BM25 vectorized ranked-OR queries/sec")]:
        cells = " | ".join(f"{results[n][key]:.1f}" for n in levels)
        effs = " | ".join(f"{eff(lo, hi, key):.2f}" for lo, hi in pairs)
        rows.append(f"| {label} | {cells} | {effs} |")
    ec = os.environ.get("SCALING_EXEC_CORES", "8")
    level_hdr = " | ".join(f"{n} exec x{ec}" for n in levels)
    eff_hdr = " | ".join(f"eff {lo}->{hi}" for lo, hi in pairs)
    phase_rows = []
    for pk, pl in [("corpus_s", "corpus+postings"), ("dicts_s", "dict learning"),
                   ("encode_max_s", "encode (slowest bucket)")]:
        cells = " | ".join(f"{results[n]['phases'][pk]:.1f}s" for n in levels)
        phase_rows.append(f"| {pl} | {cells} |")

    md = f"""# BENCH — scaling evidence (north rule: N -> 4N efficiency >= 0.8)

Same jobs, same input ({num_docs:,} deterministic Zipfian pages, seed 42).
Each level = N separate executor JVMs (local-cluster master) of 8 cores /
16 GiB each, fresh driver subprocess per level — the sandbox stand-in for
N vs 4N executors per BASELINE.md. The 1 -> 4 executor pair is the
north-rule ratio; all executors still share one physical memory bus
(see below).

| metric | {level_hdr} | {eff_hdr} |
|---|{"---|" * (len(levels) + len(pairs))}
{chr(10).join(rows)}

Per-phase build walls:

| phase | {level_hdr} |
|---|{"---|" * len(levels)}
{chr(10).join(phase_rows)}

## The single-box memory-bus caveat

A pure-CPU python workload on this host scales 8 -> 32 processes at ~0.85
per-core efficiency, but a numpy gather/scan workload (exactly what the
decode/score kernels are) measures only ~1.4x total throughput from 8 ->
32 processes in a Spark-free multiprocessing benchmark — one socket's
memory bandwidth saturates near 8-12 busy cores. On a real cluster each
additional executor brings its own memory channels; in this sandbox all
4 executors share one bus, so 1 -> 4 executor efficiency measured here is
a LOWER BOUND on what the same plan does on real hardware. Complementary
evidence: per-phase plan properties (PLANS.md) show no driver bottleneck,
no all-to-one shuffle, work partitioned ~4 tasks/core with explicit skew
spreading — nothing in the plan caps executor count; and the encode stage
in isolation scales 8 -> 32 multiprocessing at 0.75 (python-DP-bound, not
bandwidth-bound).

## Measurement protocol

One warmup + 3 timed 500-query BM25 top-10 batches (best-of-3), per
src/queries.cpp:25-36; build timed end-to-end from pages to segments
including dictionary learning and all checkpoints (fresh output dir).
"""
    # BENCH.md is hand-curated; write the generated tables next to it and
    # fold them in manually (the old default silently clobbered BENCH.md)
    if os.environ.get("SCALING_WRITE_MD", "1") != "0":
        out_md = os.path.join(REPO, "BENCH_scaling_last_run.md")
        with open(out_md, "w") as f:
            f.write(md)
        print(f"wrote {out_md}")


if __name__ == "__main__":
    main()

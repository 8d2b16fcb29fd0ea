"""1M-doc absolute-scale run of the round-3 evaluation + sketch ops:

  rank_eval_1m    run_rank_eval over the gate 1M index with head/mid/
                  tail AND judgments — the head query's judged set is
                  ~40% of the corpus, so the rel-histogram IDCG fold
                  aggregates ~4*10^5 judged docs per query without a
                  window (the scale property PLANS.md check 22 asserts)
  term_vectors_1m the ES _termvectors point fetch for 8 docs out of
                  10^6 (pushed-down id lookup + broadcast stats join)
  hll_10m         cardinality_sketch over 10^7 synthetic events with
                  ~2*10^6 distinct users per key: sketch wall vs exact
                  count-distinct wall on the SAME frame, plus the
                  estimate error vs exact per key (must sit inside the
                  1.04/sqrt(1024) = 3.25% envelope at ~3 sigma)

Usage: python scripts/rankeval_1m.py [index_dir] [pages_parquet]
Writes rankeval_1m_result.json at the repo root. Host probes recorded
at both ends (the BENCH.md variance protocol).
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
    pages = (sys.argv[2] if len(sys.argv) > 2
             else "/tmp/gate1m_pages_1000000.parquet")
    docs_path = os.path.join(
        os.path.dirname(pages),
        os.path.basename(pages).replace("pages", "docs"))

    from bench import host_health_probe
    from dint_spark.index import load_index
    from dint_spark.session import get_spark

    if not os.path.exists(docs_path):
        import duckdb

        con = duckdb.connect()
        con.sql(f"SET threads TO {min(16, os.cpu_count() or 8)}")
        con.sql(f"""
COPY (SELECT row_number() OVER (ORDER BY url) - 1 AS doc_id, text
      FROM '{pages}/*.parquet')
TO '{docs_path}' (FORMAT parquet, PER_THREAD_OUTPUT true)
""")

    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = (f"local-cluster[{min(2, n_cpus // 8)},8,16384]"
              if n_cpus >= 16 else f"local[{n_cpus}]")
    spark = get_spark("rankeval_1m", master=master,
                      shuffle_partitions=max(32, n_cpus))

    from pyspark.sql import functions as F

    health_start = host_health_probe()
    idx = load_index(spark, idx_dir)
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    vocab = (idx.vocab().select("term_id", "term", "df")
             .orderBy("term_id").toPandas())
    mid = int((vocab["df"] - 1000).abs().idxmin())
    tail = int((vocab["df"] - 50).abs().idxmin())
    specs = [[0], [1, 5], [mid, 2], [tail], [0, 3], [7, 9]]
    results: dict = {"num_docs": idx.num_docs, "specs_dfs": [
        [int(vocab["df"][t]) for t in s] for s in specs]}

    # ---- rank_eval over the full 1M index ---------------------------------
    from dint_spark.rankeval import run_rank_eval

    t0 = time.time()
    rows = run_rank_eval(spark, idx, specs, k=10).orderBy(
        "query_id").collect()
    results["rank_eval_s"] = round(time.time() - t0, 1)
    results["rank_eval_rows"] = [
        {k: int(r[k]) for k in ("query_id", "p_at_k_x", "mrr_x",
                                "ndcg_x", "idcg_x")} for r in rows]

    # ---- term vectors: 8-doc point fetch out of 10^6 ----------------------
    from dint_spark.tokenizer import tokenize

    tv_ids = [0, 123_456, 250_000, 400_000, 555_555, 700_000, 876_543,
              999_999]
    t0 = time.time()
    req = tokenize(docs.where(F.col("doc_id").isin(tv_ids)))
    tf = (req.select("doc_id", F.explode("tokens").alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    if "ttf" in idx.vocab().columns:
        # metadata path: df+ttf ride the vocabulary, no corpus scan
        out = (tf.join(F.broadcast(idx.vocab()
                                   .select("term", "df", "ttf")), "term")
               .select("doc_id", "term", "tf", "df", "ttf"))
    else:
        ttf = (tokenize(docs).select(F.explode("tokens").alias("term"))
               .groupBy("term").agg(F.count("*").alias("ttf")))
        out = (tf.join(F.broadcast(idx.vocab().select("term", "df")),
                       "term")
               .join(F.broadcast(ttf), "term")
               .select("doc_id", "term", "tf", "df", "ttf"))
    results["term_vectors_rows"] = out.count()
    results["term_vectors_s"] = round(time.time() - t0, 1)

    # ---- HLL sketch vs exact count-distinct at 10^7 events ----------------
    from dint_spark.ops.events import cardinality_sketch, hll_estimate

    ev = (spark.range(10_000_000)
          .select((F.col("id") % 5).cast("string").alias("etype"),
                  # ~2M distinct users per key, hash-scattered
                  F.concat(F.lit("u"),
                           F.pmod(F.xxhash64("id"), F.lit(2_000_000)))
                  .alias("user")).persist())
    ev.count()
    t0 = time.time()
    sk = cardinality_sketch(ev, key="etype", value="user").collect()
    results["hll_sketch_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    exact = {r["etype"]: r["n"] for r in
             ev.groupBy("etype").agg(
                 F.countDistinct("user").alias("n")).collect()}
    results["exact_distinct_s"] = round(time.time() - t0, 1)
    errs = {}
    for r in sk:
        est = hll_estimate(int(r["regs_zero"]), int(r["harmonic_x"]))
        errs[r["etype"]] = round(
            abs(est - exact[r["etype"]]) / exact[r["etype"]], 4)
    results["hll_rel_err_per_key"] = errs
    results["hll_max_rel_err"] = max(errs.values())
    ev.unpersist()

    results["host_health"] = {"start": health_start,
                              "end": host_health_probe()}
    out_json = os.path.join(REPO, "rankeval_1m_result.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

"""1M-doc absolute-scale run of the result-page / compound-query ops:
field collapsing, sort-by-field, range facets, cursor pagination (deep
page), the bool DSL, and multi_match over per-field 1M indexes.

These ops all score or bucket the FULL match set in-kernel, so the 1M
run exercises what sf0.1 can't: a head-term query matches ~40% of docs,
making the per-query exact pass cover ~400k postings-scored docs
(collapse/page) or ~400k ordinal/value lookups (facets/sort). The
multi_match leg additionally builds title/body per-field 1M indexes
once (cached) — per-field stats at web shape. Host probes recorded at
both ends (the BENCH.md variance protocol).

Usage: python scripts/serp_1m.py [index_dir] [pages_parquet]
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
    docs_path = pages.replace("pages", "docs")

    from bench import host_health_probe
    from dint_spark.index import IndexConfig, build_index, load_index
    from dint_spark.session import get_spark

    health_start = host_health_probe()
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
    spark = get_spark("serp_1m", master=master,
                      shuffle_partitions=max(32, n_cpus))

    import numpy as np
    from pyspark.sql import functions as F

    idx = load_index(spark, idx_dir)
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    vocab = (idx.vocab().select("term_id", "df")
             .orderBy("term_id").toPandas())
    mid = int((vocab["df"] - 1000).abs().idxmin())
    tail = int((vocab["df"] - 50).abs().idxmin())
    # head/mid/tail AND+OR mix; term 0 matches ~40% of the corpus
    specs = [[0], [1, 5], [mid, 2], [tail], [0, 3], [7, 9]]
    results: dict = {"num_docs": idx.num_docs, "specs_dfs": [
        [int(vocab["df"][t]) for t in s] for s in specs]}

    # ---- doc values + sort-by-field + range facets -------------------------
    from dint_spark.facets import (build_doc_facets, build_doc_values,
                                   run_collapsed_queries,
                                   run_range_facet_queries,
                                   run_sorted_queries)

    dv_docs = docs.withColumn("nchars", F.length("text"))
    t0 = time.time()
    vals = build_doc_values(spark, dv_docs, idx.num_docs, "nchars")
    results["doc_values_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    n = run_sorted_queries(spark, idx, specs, vals, k=10).count()
    results["sort_by_field_s"] = round(time.time() - t0, 1)
    results["sort_rows"] = int(n)
    lo, hi = int(vals.min()), int(vals.max())
    edges = list(range(lo, hi + 1, max(1, (hi - lo) // 8)))
    t0 = time.time()
    n = run_range_facet_queries(spark, idx, specs, vals, edges).count()
    results["range_facets_s"] = round(time.time() - t0, 1)

    # ---- field collapsing: 1000-domain facet, full-match-set scoring -------
    fdocs = docs.select(
        "doc_id",
        F.format_string("site%04d", (F.col("doc_id") % 1000)
                        .cast("int")).alias("site"))
    t0 = time.time()
    fac = build_doc_facets(spark, fdocs, idx.num_docs, "site")
    results["facet_build_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    n = run_collapsed_queries(spark, idx, specs, fac, k=10).count()
    results["collapse_s"] = round(time.time() - t0, 1)
    results["collapse_rows"] = int(n)

    # ---- cursor pagination: page 1, then a deep page ----------------------
    from dint_spark.paging import run_queries_after

    t0 = time.time()
    p1 = {int(r["query_id"]): (int(r["score_q"]), int(r["doc_id"]))
          for r in run_queries_after(spark, idx, specs, None, k=10)
          .where(F.col("rank") == 10).collect()}
    results["page1_s"] = round(time.time() - t0, 1)
    # simulate depth: chase 5 cursor hops (pages 2..6) — each hop is a
    # fresh k-entry selection, cost must stay ~flat vs page 1
    cur = [p1.get(q, (-(10 ** 18), 0)) for q in range(len(specs))]
    t0 = time.time()
    for _ in range(5):
        nxt = {int(r["query_id"]): (int(r["score_q"]), int(r["doc_id"]))
               for r in run_queries_after(spark, idx, specs, cur, k=10)
               .where(F.col("rank") == 10).collect()}
        cur = [nxt.get(q, (-(10 ** 18), 0)) for q in range(len(specs))]
    results["pages2to6_s"] = round(time.time() - t0, 1)

    # ---- bool DSL ----------------------------------------------------------
    from dint_spark.bool_query import BoolSpec, run_bool_queries

    bspecs = [BoolSpec(must=[0], should=[3, 5, 7], min_should=1),
              BoolSpec(should=[0, 1, 2], min_should=2),
              BoolSpec(must=[mid], must_not=[1]),
              BoolSpec(must=[1, 3], must_not=[tail])]
    t0 = time.time()
    n = run_bool_queries(spark, idx, bspecs, k=10).count()
    results["bool_dsl_s"] = round(time.time() - t0, 1)
    results["bool_rows"] = int(n)

    # ---- multi_match: per-field 1M indexes (built once, cached) ------------
    from dint_spark.multifield import run_multi_match

    toks = F.filter(F.split(F.lower("text"), "[^0-9a-z]+"),
                    lambda x: x != F.lit(""))
    fields = {
        "title": F.concat_ws(" ", F.slice(toks, 1, 8)),
        "body": F.concat_ws(" ", F.slice(toks, 9, 1 << 30)),
    }
    from dint_spark.corpus import pages_from_documents

    fidx = {}
    for fname, expr in fields.items():
        fdir = f"/tmp/gate1m_{fname}_idx"
        if not os.path.exists(os.path.join(fdir, "manifest.json")):
            fd = docs.select("doc_id", expr.alias("text"),
                             F.lit("xx").alias("lang"))
            t0 = time.time()
            build_index(spark, pages_from_documents(fd), fdir,
                        IndexConfig(num_buckets=8,
                                    input_tag=f"gate1m-{fname}"))
            results[f"{fname}_index_build_s"] = round(time.time() - t0, 1)
        fidx[fname] = load_index(spark, fdir)
    terms = (idx.vocab().select("term", "df")
             .orderBy(F.desc("df")).limit(400).toPandas()["term"])
    rng = np.random.default_rng(11)
    queries = [" ".join(rng.choice(terms, size=rng.integers(2, 4)))
               for _ in range(32)]
    t0 = time.time()
    n = run_multi_match(spark, fidx, queries, boosts={"title": 2.0,
                                                      "body": 1.0},
                        mode="best_fields", tie_breaker=0.25,
                        k=10).count()
    results["multi_match_32q_s"] = round(time.time() - t0, 1)
    results["multi_match_rows"] = int(n)

    results["host_health"] = {"start": health_start,
                              "end": host_health_probe()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
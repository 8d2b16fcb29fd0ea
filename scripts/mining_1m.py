"""1M-doc absolute-scale run of the round-3 search-surface ops:
significant_terms, more_like_this, suggest_spelling over the cached gate
index (92.6M postings) and its url-rank-id documents table.

These three join the index kernels to the corpus table, so the 1M run
exercises the parts sf0.1 can't: the matched-docs x tokenized-corpus
aggregation at a ~40%-selectivity match set (significant_terms' real
cost), the delete-1 table build over the full vocabulary, and the
broadcast source-doc pass. Host probes recorded at both ends (the
BENCH.md variance protocol).

Usage: python scripts/mining_1m.py [index_dir] [pages_parquet]
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
    from dint_spark.index import load_index
    from dint_spark.mining import more_like_this, significant_terms
    from dint_spark.search import build_fuzzy_table, suggest_spelling
    from dint_spark.session import get_spark

    health_start = host_health_probe()

    # the engine's dense doc ids are url-rank (full_gate_1m prelude);
    # materialize (doc_id, text) once via DuckDB — cached across runs
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
    spark = get_spark("mining_1m", master=master,
                      shuffle_partitions=max(32, n_cpus))

    idx = load_index(spark, idx_dir)
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    vocab = (idx.vocab().select("term_id", "df")
             .orderBy("term_id").toPandas())
    results: dict = {"num_docs": idx.num_docs,
                     "vocab_terms": int(len(vocab))}

    # ---- significant_terms: head/mid/tail AND match sets -------------------
    # term 0 matches ~40% of docs — the foreground aggregation then sees
    # ~n_matched x distinct-terms-per-doc rows, the op's true scale cost
    mid = int((vocab["df"] - 1000).abs().idxmin())
    tail = int((vocab["df"] - 50).abs().idxmin())
    specs = [[0], [1, 5], [mid, 2], [tail]]
    t0 = time.time()
    n_sig = significant_terms(spark, idx, specs, docs, k=10).count()
    results["significant_terms_s"] = round(time.time() - t0, 1)
    results["significant_terms_rows"] = int(n_sig)
    results["sig_specs_dfs"] = [
        [int(vocab["df"][t]) for t in s] for s in specs]

    # ---- more_like_this: 8 sources spread across the id range --------------
    srcs = [0, 123_456, 250_000, 400_000, 555_555, 700_000, 876_543,
            999_999]
    t0 = time.time()
    n_mlt = more_like_this(spark, idx, srcs, docs, k=10, max_terms=16,
                           min_tf=1, min_df=2, max_df_frac=0.5).count()
    results["more_like_this_s"] = round(time.time() - t0, 1)
    results["more_like_this_rows"] = int(n_mlt)

    # ---- suggest_spelling: fuzzy-table build + a 100-word probe batch ------
    fuzzy_path = os.path.join("/tmp", "gate1m_fuzzy.parquet")
    t0 = time.time()
    build_fuzzy_table(spark, idx, path=fuzzy_path)
    results["fuzzy_table_build_s"] = round(time.time() - t0, 1)
    import numpy as np

    rng = np.random.default_rng(17)
    terms = (idx.vocab().select("term").orderBy("term")
             .toPandas()["term"])
    picks = rng.choice(len(terms), size=100, replace=False)
    words = []
    for j, i in enumerate(picks):
        w = terms[int(i)]
        words.append(w[:-1] if j % 3 == 0 else
                     (w + "x" if j % 3 == 1 else w))
    t0 = time.time()
    n_sug = suggest_spelling(spark, idx, words, n=5,
                             fuzzy_path=fuzzy_path).count()
    results["suggest_100w_s"] = round(time.time() - t0, 1)
    results["suggest_rows"] = int(n_sug)

    results["host_health"] = {"start": health_start,
                              "end": host_health_probe()}
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Multi-shard absolute-scale gate (round-4 VERDICT item 2): the
10^12-doc docid-sharded topology re-verified with REAL shards at the
largest corpus the sandbox sustains — 4M docs across >= 4 docid shards
(~370M postings), every check value-exact.

The sf0.01 sharding tests pin logic equality; this catches scale-only
wrongness in the shard fan-out itself: base-offset arithmetic at
million-doc shard widths, per-shard u32 locality, global-vs-local
statistics routing, per-shard DocMask chunk packing, and the pinned
per-epoch serving merge — at a size where every shard holds ~1M docs.

Checks (all engine vs DuckDB recomputing from the same pages parquet,
plus sharded-vs-monolithic equality where stated):
  doclens_ms       global doclens checksum (order-free, O(1) transfer)
  vocab_ms         global vocab (term_id, df) checksum; sharded ==
                   monolithic == DuckDB (the shared-term-id contract)
  postings_sharded_ms  full DINT decode of EVERY shard, local ids
                   shifted by the manifest base, unioned -> checksum ==
                   DuckDB postings == the monolithic index's decode
  bm25_sharded_ms  sampled queries: sharded fan-out top-10 (float64,
                   1e-9-quantized) == DuckDB exhaustive, row-for-row,
                   AND == monolithic run_queries row-for-row
  serve_sharded_ms ShardedQueryServer (one pinned broadcast server per
                   shard) == the batch fan-out, row-for-row; serve wall
  filter_sharded_ms  per-shard DocMask allowlist (doc_id % 3 != 1) via
                   build_doc_filters_sharded == DuckDB filtered oracle
  delete_sharded_ms  50k tombstoned global ids (delete_docs_sharded,
                   pre-delete statistics per the contract) == DuckDB
                   excluding the deleted set

Usage: python scripts/full_gate_multishard.py [num_docs] [num_shards]
Writes full_gate_multishard_result.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dint_spark.session import get_spark  # noqa: E402

M1, M2 = 2147483647, 2147483629
A1, B1, C1 = 1315423911, 2654435761, 97
A2, B2, C2 = 31, 1000003, 8191

N_QUERIES = 200
N_DELETES = 50_000


def _cksum_exprs(t: str, d: str, f: str) -> str:
    """Order-free checksum: count + sum + two independent modular
    row-mixes, identical SQL text in Spark and DuckDB (the full_gate_1m
    protocol; the outer BIGINT cast defuses DuckDB's HUGEINT->float64)."""
    return (
        f"count(*) AS n, "
        f"cast(sum({f}) as bigint) AS sf, "
        f"cast(sum(({t} * {A1} + {d} * {B1} + {f} * {C1}) % {M1}) "
        f"as bigint) AS h1, "
        f"cast(sum(({t} * {A2} + {d} * {B2} + {f} * {C2}) % {M2}) "
        f"as bigint) AS h2"
    )


def _spark_cksum(df, t: str, d: str, f: str) -> dict:
    df.createOrReplaceTempView("cksum_in")
    row = df.sparkSession.sql(
        f"SELECT {_cksum_exprs(t, d, f)} FROM cksum_in").collect()[0]
    return {k: int(row[k]) for k in ("n", "sf", "h1", "h2")}


def _reset_tombstones(out_dir: str) -> None:
    """Make reruns idempotent: the delete check writes real tombstone
    epochs into the cached shard dirs; strip them before loading."""
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        if not name.startswith("shard="):
            continue
        ddir = os.path.join(sdir, "deletes")
        man_path = os.path.join(sdir, "manifest.json")
        if os.path.exists(ddir):
            shutil.rmtree(ddir)
        if os.path.exists(man_path):
            with open(man_path) as fh:
                man = json.load(fh)
            if "deletes" in man:
                del man["deletes"]
                tmp = man_path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(man, fh, indent=1)
                os.replace(tmp, man_path)


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    num_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_json = os.path.join(REPO, "full_gate_multishard_result.json")
    PAGES = f"/tmp/gatems_pages_{num_docs}.parquet"
    SIDX = f"/tmp/gatems_sidx_{num_docs}_{num_shards}"
    # the monolithic build carries num_docs per bucket task where each
    # docid shard carries num_docs/num_shards — scale its bucket count so
    # per-bucket encode state stays in the executor heap at 4M docs
    mono_buckets = max(8, 8 * (num_docs // 1_000_000))
    MONO = f"/tmp/gatems_mono_{num_docs}_b{mono_buckets}"

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    n_cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    master = (f"local-cluster[{min(2, n_cpus // 8)},8,24576]"
              if n_cpus >= 16 else f"local[{n_cpus}]")
    spark = get_spark("full_gate_multishard", master=master,
                      shuffle_partitions=max(32, n_cpus))

    from bench import host_health_probe, make_query_workload
    from dint_spark.corpus import generate_pages
    from dint_spark.index import IndexConfig, build_index, load_index
    from dint_spark.queries import decoded_postings, run_queries
    from dint_spark.sharding import (ShardedIndex, ShardedQueryServer,
                                     build_doc_filters_sharded,
                                     build_sharded_index,
                                     delete_docs_sharded,
                                     run_queries_sharded)

    results: dict = {"num_docs": num_docs, "num_shards": num_shards,
                     "master": master,
                     "host_health_start": host_health_probe()}
    t_all = time.time()

    # -- corpus: ONE parquet both engines read ------------------------------
    if not os.path.exists(PAGES):
        generate_pages(spark, num_docs, seed=42).select(
            "url", "text").write.mode("overwrite").parquet(PAGES)
    pages = spark.read.parquet(PAGES).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text", F.lit("en").alias("lang"))

    # -- builds (both resumable; walls recorded on a cold run) --------------
    cfg = IndexConfig(num_buckets=8, input_tag="gatems")
    if os.path.exists(SIDX):
        _reset_tombstones(SIDX)
    t0 = time.time()
    sidx = build_sharded_index(spark, pages, SIDX, num_shards, cfg)
    results["sharded_build_s"] = round(time.time() - t0, 1)
    assert len(sidx.shards) == num_shards, "shard count drift"
    results["shard_num_docs"] = [s.num_docs for s in sidx.shards]

    t0 = time.time()
    # build_index is resumable (per-bucket checkpoints): an interrupted
    # prior run leaves a manifest without the final "meta" step, so always
    # route through the builder — complete indexes no-op
    build_index(spark, pages, MONO,
                IndexConfig(num_buckets=mono_buckets,
                            input_tag="gatems-mono"))
    results["mono_build_s"] = round(time.time() - t0, 1)
    mono = load_index(spark, MONO)

    # -- DuckDB oracle: identical tokenize + url-rank ids + vocab rank ------
    con = duckdb.connect()
    con.sql(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    con.sql(f"CREATE VIEW pages AS SELECT * FROM '{PAGES}/*.parquet'")
    t_step = time.time()
    con.sql("""
CREATE TABLE ids AS
SELECT row_number() OVER (ORDER BY url) - 1 AS doc_id, text FROM pages""")
    con.sql("""
CREATE TABLE tf AS
SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^0-9a-z]+')) AS term
  FROM ids
) WHERE term <> '' GROUP BY 1, 2""")
    con.sql("""
CREATE TABLE dl AS
SELECT d.doc_id, coalesce(sum(t.tf), 0)::BIGINT AS len
FROM ids d LEFT JOIN tf t ON d.doc_id = t.doc_id GROUP BY 1""")
    con.sql("""
CREATE TABLE stats AS
SELECT (SELECT count(*) FROM ids)::BIGINT AS n_docs,
       (SELECT avg(len) FROM dl) AS avg_len""")
    con.sql("""
CREATE TABLE vocab AS
SELECT term, count(*)::BIGINT AS df,
       row_number() OVER (ORDER BY count(*) DESC, term ASC) - 1 AS term_id
FROM tf GROUP BY term""")
    results["oracle_materialize_s"] = round(time.time() - t_step, 1)

    def check(name: str, engine: dict, oracle: dict) -> None:
        ok = engine == oracle
        results[name] = {"ok": ok, "engine": engine, "oracle": oracle,
                         "sec": round(time.time() - t_step, 1)}
        print(("PASS " if ok else "FAIL ") + name, engine,
              "" if ok else oracle, flush=True)

    def check_df(name: str, eng_pdf, ora_pdf, extra: dict | None = None):
        ok = (len(eng_pdf) == len(ora_pdf)
              and bool((eng_pdf.values == ora_pdf.values).all()))
        results[name] = {"ok": ok, "rows": [len(eng_pdf), len(ora_pdf)],
                         "sec": round(time.time() - t_step, 1),
                         **(extra or {})}
        print(("PASS " if ok else "FAIL ") + name, results[name],
              flush=True)

    # -- global doclens ------------------------------------------------------
    t_step = time.time()
    dlf = spark.read.parquet(os.path.join(SIDX, "doclens.parquet"))
    eng = _spark_cksum(dlf.select("doc_id", F.lit(0).alias("z"), "len"),
                       "doc_id", "z", "len")
    ora = con.sql(
        f"SELECT {_cksum_exprs('doc_id', '0', 'len')} FROM dl").df().iloc[0]
    check("doclens_ms", eng, {k: int(ora[k]) for k in eng})

    # -- global vocab: sharded == monolithic == DuckDB -----------------------
    t_step = time.time()
    sv = _spark_cksum(sidx.vocab().select(
        "term_id", F.lit(0).alias("z"), "df"), "term_id", "z", "df")
    mv = _spark_cksum(mono.vocab().select(
        "term_id", F.lit(0).alias("z"), "df"), "term_id", "z", "df")
    ov = con.sql(
        f"SELECT {_cksum_exprs('term_id', '0', 'df')} FROM vocab"
    ).df().iloc[0]
    ok = sv == mv == {k: int(ov[k]) for k in sv}
    results["vocab_ms"] = {"ok": ok, "sharded": sv, "mono": mv,
                           "sec": round(time.time() - t_step, 1)}
    print(("PASS " if ok else "FAIL ") + "vocab_ms", sv, flush=True)

    # -- full decode of every shard, shifted to global ids -------------------
    t_step = time.time()
    parts = []
    for s, idx in enumerate(sidx.shards):
        dec = decoded_postings(idx, parallelism=n_cpus * 2)
        parts.append(dec.select(
            "term_id", (F.col("doc_id") + sidx.bases[s]).alias("doc_id"),
            "freq"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    eng_sh = _spark_cksum(allp, "term_id", "doc_id", "freq")
    ora_post = con.sql(
        "SELECT " + _cksum_exprs("v.term_id", "tf.doc_id", "tf.tf")
        + " FROM tf JOIN vocab v ON tf.term = v.term").df().iloc[0]
    check("postings_sharded_ms", eng_sh, {k: int(ora_post[k]) for k in eng_sh})

    t_step = time.time()
    eng_mono = _spark_cksum(
        decoded_postings(mono, parallelism=n_cpus * 2),
        "term_id", "doc_id", "freq")
    check("postings_mono_ms", eng_mono, eng_sh)

    # -- sampled BM25: sharded fan-out == DuckDB == monolithic ---------------
    # engine ranks by float64 and the oracle quantizes-then-ranks, so the
    # engine runs with k=100 headroom and the compare re-quantizes (the
    # driver-contract pattern); terms in the idf-floor regime (df close
    # to N/2 -> idf == 1e-6) are excluded from the workload — their
    # quantized tie plateaus span thousands of docs at 4M, more than any
    # finite headroom (the first 4M run caught exactly this: score_q
    # 2137 plateau, engine float-top-10 vs oracle lowest-doc_id ties)
    t_step = time.time()
    vocab_pdf = sidx.vocab().select("term_id", "df").toPandas()
    nondegen = vocab_pdf[vocab_pdf["df"] <= int(0.45 * sidx.num_docs)]
    queries = make_query_workload(nondegen, N_QUERIES, 4242)

    def topk_pdf(raw):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score_q"), F.asc("doc_id"))
        return (
            raw.withColumn("score_q",
                           F.floor(F.col("score") * 1e9).cast("long"))
            .withColumn("qrank", F.row_number().over(w))
            .where(F.col("qrank") <= 10)
            .select("query_id", F.col("qrank").cast("int").alias("rank"),
                    "doc_id", "score_q")
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    t0 = time.time()
    eng_top = topk_pdf(run_queries_sharded(
        spark, sidx, queries, algo="block_max_wand_vec", k=100,
        dtype="float64"))
    sharded_wall = round(time.time() - t0, 1)
    qvals = ", ".join(f"({qi}, {t}, 1)" for qi, ts in enumerate(queries)
                      for t in ts)

    def oracle_topk(where: str = "TRUE") -> "object":
        return con.sql(f"""
WITH qs(query_id, term_id, qf) AS (VALUES {qvals}),
scored AS (
  SELECT qs.query_id, tf.doc_id,
         sum(
           qs.qf * greatest(1e-6, ln((s.n_docs - v.df + 0.5) / (v.df + 0.5)))
           * (1 + 1.2)
           * (tf.tf / (tf.tf + 1.2 * (0.5 + 0.5 * (dl.len / s.avg_len))))
         ) AS score
  FROM qs
  JOIN vocab v ON v.term_id = qs.term_id
  JOIN tf ON tf.term = v.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE {where}
  GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_q FROM (
  SELECT query_id, doc_id, floor(score * 1e9)::BIGINT AS score_q,
         row_number() OVER (PARTITION BY query_id
           ORDER BY floor(score * 1e9) DESC, doc_id ASC)::INT AS rank
  FROM scored
) r WHERE rank <= 10
ORDER BY query_id, rank
""").df()

    check_df("bm25_sharded_ms", eng_top, oracle_topk(),
             {"n_queries": N_QUERIES, "sharded_wall_s": sharded_wall})

    t_step = time.time()
    t0 = time.time()
    mono_top = topk_pdf(run_queries(
        spark, mono, queries, algo="block_max_wand_vec", k=100,
        dtype="float64"))
    check_df("bm25_mono_vs_sharded_ms", mono_top, eng_top,
             {"mono_wall_s": round(time.time() - t0, 1)})

    # -- pinned per-shard serving == the batch fan-out -----------------------
    t_step = time.time()
    terms = sorted({int(t) for ts in queries for t in ts})
    t0 = time.time()
    server = ShardedQueryServer(spark, sidx, terms=terms, dtype="float64",
                                max_broadcast_bytes=1 << 31)
    pin_s = round(time.time() - t0, 1)
    server.serve(queries, algo="block_max_wand_vec", k=100).count()  # warm
    t0 = time.time()
    srv_top = topk_pdf(server.serve(queries, algo="block_max_wand_vec",
                                    k=100))
    serve_wall = round(time.time() - t0, 2)
    check_df("serve_sharded_ms", srv_top, eng_top,
             {"pin_s": pin_s, "serve_wall_s": serve_wall,
              "q_per_s": round(N_QUERIES / serve_wall, 1)})

    # -- per-shard DocMask allowlist -----------------------------------------
    t_step = time.time()
    allowed = spark.range(num_docs).where(F.col("id") % 3 != 1).select(
        F.col("id").alias("doc_id"))
    masks = build_doc_filters_sharded(spark, sidx, allowed)
    eng_filt = topk_pdf(run_queries_sharded(
        spark, sidx, queries, algo="block_max_wand_vec", k=100,
        dtype="float64", doc_filters=masks))
    check_df("filter_sharded_ms", eng_filt,
             oracle_topk("tf.doc_id % 3 != 1"))

    # -- tombstones across shards (destructive; reset at next run) -----------
    t_step = time.time()
    rng = np.random.default_rng(777)
    dels = np.unique(rng.integers(0, num_docs, size=N_DELETES))
    n_new = delete_docs_sharded(spark, sidx, dels.tolist())
    con.sql("CREATE TABLE dels (doc_id BIGINT)")
    con.executemany("INSERT INTO dels VALUES (?)",
                    [(int(d),) for d in dels])
    eng_del = topk_pdf(run_queries_sharded(
        spark, sidx, queries, algo="block_max_wand_vec", k=100,
        dtype="float64"))
    check_df("delete_sharded_ms", eng_del,
             oracle_topk("tf.doc_id NOT IN (SELECT doc_id FROM dels)"),
             {"n_deleted": int(n_new)})

    results["host_health_end"] = host_health_probe()
    results["total_s"] = round(time.time() - t_all, 1)
    results["all_pass"] = all(
        v.get("ok", True) for v in results.values() if isinstance(v, dict)
        and "ok" in v)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(("ALL PASS" if results["all_pass"] else "FAILURES") +
          f" total_s={results['total_s']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

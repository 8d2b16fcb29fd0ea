"""Absolute-scale correctness gate: core entries re-verified on a 10^6-doc
corpus against a DuckDB oracle (round-2 VERDICT item 4). The sf0.01 gate
catches logic errors; this catches scale-ONLY wrongness (integer-domain
bugs, chunk/bucket boundary bugs, skew-path divergence) at the scale the
1M bench measures — the bench checks speed, this checks values.

Checks (1M docs ~ 92.6M postings unless noted):
  doclens_1m          order-free checksum of (doc_id, len)
  postings_build_1m   checksum of flattened (term_id, doc_id, tf) from the
                      engine's postings checkpoint vs DuckDB recomputing
                      tokenize+tf+vocab-rank from the same pages parquet
  dint_roundtrip_1m   the same checksum over decoded_postings (full DINT
                      decode of every segment) — check_index at 1M
  bm25_bmw_vec_1m     sampled queries: engine block-max-WAND top-10
                      (float64, 1e-9-quantized like the sf gate) vs DuckDB
                      exhaustive scoring, row-for-row
  dedup_minhash_1m    100k-doc subset with injected near-dups (DuckDB's
                      shingle unnest bounds the oracle): engine pairs vs
                      oracle, row-for-row

Checksum: sum over rows of two independent modular row-mixes + count +
plain sums, computed engine-side in Spark SQL and oracle-side in DuckDB —
order-free and O(1) transfer, so 92.6M-row tables compare exactly without
materializing either side (a pandas hash-compare at this scale would be
the bottleneck and the OOM risk).

Usage: python scripts/full_gate_1m.py [num_docs] [out_json]
Writes full_gate_1m_result.json at the repo root by default.
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

M1, M2 = 2147483647, 2147483629  # two coprime 31-bit moduli
A1, B1, C1 = 1315423911, 2654435761, 97
A2, B2, C2 = 31, 1000003, 8191

N_QUERIES = 200
DEDUP_DOCS = 100_000
DEDUP_DUPES = 1_000


def _cksum_exprs(t: str, d: str, f: str) -> str:
    """The two modular row-mixes + count + sums, as SQL aggregates (same
    text runs in Spark SQL and DuckDB — both are int64 engines and the
    per-row products stay far below 2^63).

    The outer CAST matters at this scale: DuckDB widens sum(BIGINT) to
    HUGEINT, which pandas converts to float64 — above 2^53 (~9e15, and
    these sums reach ~1e17 at 92.6M rows) that conversion rounds by a few
    units and produces phantom mismatches against Spark's exact int64
    sum. CAST(... AS BIGINT) is exact (the true sums stay < 2^63) and is
    a no-op on the Spark side."""
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


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_json = (sys.argv[2] if len(sys.argv) > 2
                else os.path.join(REPO, "full_gate_1m_result.json"))
    # cache paths keyed by corpus size so a smoke run can't satisfy the
    # full-scale run's exists-checks
    PAGES = f"/tmp/gate1m_pages_{num_docs}.parquet"
    DOCS = f"/tmp/gate1m_docs_{num_docs}"
    IDX = f"/tmp/gate1m_idx_{num_docs}"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    n_cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    master = (f"local-cluster[{min(2, n_cpus // 8)},8,16384]"
              if n_cpus >= 16 else f"local[{n_cpus}]")
    spark = get_spark("full_gate_1m", master=master,
                      shuffle_partitions=max(32, n_cpus))

    from dint_spark.corpus import generate_pages
    from dint_spark.index import IndexConfig, build_index, load_index
    from dint_spark.queries import decoded_postings, run_queries

    results: dict = {"num_docs": num_docs}
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

    if not os.path.exists(os.path.join(IDX, "manifest.json")):
        shutil.rmtree(IDX, ignore_errors=True)
        t0 = time.time()
        build_index(spark, pages, IDX,
                    IndexConfig(num_buckets=8, input_tag="gate1m"))
        results["build_s"] = round(time.time() - t0, 1)
    idx = load_index(spark, IDX)

    con = duckdb.connect()
    con.sql(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    con.sql(f"CREATE VIEW pages AS SELECT * FROM '{PAGES}/*.parquet'")
    # identical tokenize + dense ids (rank over url) + vocab rank as the
    # engine (the sf-gate _PRELUDE, with documents -> pages+url-rank ids).
    # MATERIALIZED ONCE as temp tables: with 10 value checks sharing them
    # the corpus tokenize would otherwise re-run per check (it dominated
    # the round-3 gate wall time 3x over; now it runs once).
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
    # the check SQL below predates the materialization and starts either
    # with "SELECT" or with ", cte AS (...)" expecting a WITH prefix
    prelude = "WITH _one AS (SELECT 1)\n"

    def check(name: str, engine: dict, oracle: dict) -> None:
        ok = engine == oracle
        results[name] = {"ok": ok, "engine": engine, "oracle": oracle,
                         "sec": round(time.time() - t_step, 1)}
        print(("PASS " if ok else "FAIL ") + name, engine,
              "" if ok else oracle, flush=True)

    # -- doclens ------------------------------------------------------------
    t_step = time.time()
    dlf = spark.read.parquet(os.path.join(IDX, "doclens.parquet"))
    eng = _spark_cksum(dlf.select("doc_id", F.lit(0).alias("z"), "len"),
                       "doc_id", "z", "len")
    ora = con.sql(
        prelude + f"SELECT {_cksum_exprs('doc_id', '0', 'len')} FROM dl"
    ).df().iloc[0]
    check("doclens_1m", eng, {k: int(ora[k]) for k in eng})

    # -- postings checkpoint (flattened) -------------------------------------
    t_step = time.time()
    post = spark.read.parquet(os.path.join(IDX, "postings.parquet"))
    flat = post.select(
        "term_id", F.explode(F.arrays_zip("doc_ids", "freqs")).alias("z")
    ).select("term_id", F.col("z.doc_ids").alias("doc_id"),
             F.col("z.freqs").alias("tf"))
    eng_post = _spark_cksum(flat, "term_id", "doc_id", "tf")
    ora_post_row = con.sql(
        prelude + "SELECT " + _cksum_exprs("v.term_id", "tf.doc_id", "tf.tf")
        + " FROM tf JOIN vocab v ON tf.term = v.term"
    ).df().iloc[0]
    ora_post = {k: int(ora_post_row[k]) for k in eng_post}
    check("postings_build_1m", eng_post, ora_post)

    # -- full DINT decode (check_index at 1M) --------------------------------
    t_step = time.time()
    dec = decoded_postings(idx, parallelism=n_cpus * 2)
    eng_dec = _spark_cksum(dec, "term_id", "doc_id", "freq")
    check("dint_roundtrip_1m", eng_dec, ora_post)

    # -- BM25 block-max WAND vs exhaustive oracle ----------------------------
    t_step = time.time()
    vocab_pdf = idx.vocab().select("term_id", "df").toPandas()
    rng = np.random.default_rng(4242)
    tids = vocab_pdf["term_id"].to_numpy()
    p = vocab_pdf["df"].to_numpy().astype(np.float64)
    p /= p.sum()
    queries = [
        sorted(set(map(int, rng.choice(tids, size=int(rng.integers(1, 5)),
                                       p=p))))
        for _ in range(N_QUERIES)
    ]
    raw = run_queries(spark, idx, queries, algo="block_max_wand_vec",
                      k=100, dtype="float64")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("doc_id"))
    eng_top = (
        raw.withColumn("score_q", F.floor(F.col("score") * 1e9).cast("long"))
        .withColumn("qrank", F.row_number().over(w))
        .where(F.col("qrank") <= 10)
        .select("query_id", F.col("qrank").cast("int").alias("rank"),
                "doc_id", "score_q")
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    qvals = ", ".join(f"({qi}, {t}, 1)" for qi, ts in enumerate(queries)
                      for t in ts)
    ora_top = con.sql(prelude + f"""
, qs(query_id, term_id, qf) AS (VALUES {qvals}),
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
    ok = (len(eng_top) == len(ora_top)
          and bool((eng_top.values == ora_top.values).all()))
    results["bm25_bmw_vec_1m"] = {
        "ok": ok, "rows": [len(eng_top), len(ora_top)],
        "n_queries": N_QUERIES, "sec": round(time.time() - t_step, 1)}
    print(("PASS " if ok else "FAIL ") + "bm25_bmw_vec_1m",
          results["bm25_bmw_vec_1m"], flush=True)

    # ======================================================================
    # round-3 search surface at 1M (round-3 VERDICT item 1): the entries
    # below had value evidence only at sf0.01; these re-verify them
    # row-for-row (or by exact order-free checksum where the result set
    # is corpus-sized) on the SAME 1M corpus as the core checks.
    # ======================================================================

    def check_df(name: str, eng_pdf, ora_pdf, extra: dict | None = None):
        ok = (list(eng_pdf.columns) == list(ora_pdf.columns)
              and len(eng_pdf) == len(ora_pdf)
              and bool((eng_pdf.values == ora_pdf.values).all()))
        results[name] = {"ok": ok, "rows": [len(eng_pdf), len(ora_pdf)],
                         "sec": round(time.time() - t_step, 1),
                         **(extra or {})}
        print(("PASS " if ok else "FAIL ") + name, results[name],
              flush=True)

    # one (doc_id, text) parquet with the ENGINE's url-rank ids, readable
    # by Spark — the facet/doc-value source both sides derive from
    IDSP = f"/tmp/gate1m_ids_{num_docs}.parquet"
    if not os.path.exists(IDSP):
        con.sql(f"COPY (SELECT doc_id, text FROM ids) TO '{IDSP}' "
                "(FORMAT parquet, PER_THREAD_OUTPUT true)")
    docs_sp = spark.read.parquet(IDSP)

    # head/mid/tail AND workload (the serp_1m spec shape): term 0
    # matches ~40% of the corpus, so the facet/sort/collapse kernels
    # score or bucket ~400k docs per query — what sf0.01 can't exercise
    vdf = vocab_pdf.sort_values("term_id").reset_index(drop=True)
    mid = int(vdf.iloc[(vdf["df"] - 1000).abs().idxmin()]["term_id"])
    tail = int(vdf.iloc[(vdf["df"] - 50).abs().idxmin()]["term_id"])
    fspecs = [[0], [1, 5], [mid, 2], [tail], [0, 3], [7, 9]]
    fq_vals = ", ".join(f"({qi}, {t})" for qi, ts in enumerate(fspecs)
                        for t in ts)
    matched_cte = f"""
, fq(query_id, term_id) AS (VALUES {fq_vals}),
matched AS (
  SELECT fq.query_id, tf.doc_id
  FROM fq
  JOIN vocab v ON v.term_id = fq.term_id
  JOIN tf ON tf.term = v.term
  GROUP BY 1, 2
  HAVING count(*) = (SELECT count(*) FROM fq q2
                     WHERE q2.query_id = fq.query_id)
)
"""

    # -- phrase_match at 1M (positional index; exact checksum) --------------
    t_step = time.time()
    POS_IDX = f"/tmp/gate1m_pos_idx_{num_docs}"
    if not os.path.exists(os.path.join(POS_IDX, "manifest.json")):
        shutil.rmtree(POS_IDX, ignore_errors=True)
        t0 = time.time()
        build_index(spark, pages, POS_IDX,
                    IndexConfig(num_buckets=8, positions=True,
                                input_tag="gate1m-pos"))
        results["pos_build_s"] = round(time.time() - t0, 1)
    from dint_spark.queries import run_phrase_queries
    pos_idx = load_index(spark, POS_IDX)
    # phrases drawn FROM corpus text (guaranteed occurrences, incl. a
    # mid-doc trigram) + the two head terms as a bigram (common-word
    # phrase: huge candidate sets, tiny true-match set)
    import re as _re
    phrases: list[list[str]] = []
    for _, txt in con.sql(
            "SELECT doc_id, text FROM ids "
            "WHERE doc_id IN (0, 313131, 717171) ORDER BY doc_id"
    ).fetchall():
        toks = [t for t in _re.split("[^0-9a-z]+", txt.lower()) if t]
        if len(toks) >= 2:
            phrases.append(toks[0:2])
        if len(toks) >= 5:
            phrases.append(toks[2:5])
    phrases.append([r[0] for r in con.sql(
        "SELECT term FROM vocab ORDER BY df DESC, term LIMIT 2"
    ).fetchall()])
    seen: set = set()
    phrases = [p for p in phrases
               if tuple(p) not in seen and not seen.add(tuple(p))]
    tidmap = pos_idx.term_ids(sorted({w for p in phrases for w in p}))
    pspecs = [[tidmap[w] for w in p] for p in phrases]
    eng_ph = _spark_cksum(
        run_phrase_queries(spark, pos_idx, pspecs),
        "query_id", "doc_id", "phrase_tf")
    pt_vals = ", ".join(f"({pid}, {off}, '{w}')"
                        for pid, p in enumerate(phrases)
                        for off, w in enumerate(p))
    ora_ph_row = con.sql(f"""
WITH pt(phrase_id, off, term) AS (VALUES {pt_vals}),
toks_ne AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS ord
    FROM (SELECT doc_id,
                 string_split_regex(lower(text), '[^0-9a-z]+') AS l
          FROM ids)
  ) WHERE term <> ''
),
toks_pos AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos
  FROM toks_ne
),
ppos AS (SELECT * FROM toks_pos
         WHERE term IN (SELECT DISTINCT term FROM pt)),
plen AS (SELECT phrase_id, count(*) AS len FROM pt GROUP BY 1),
hits AS (
  SELECT pt.phrase_id, tp.doc_id, tp.pos - pt.off AS start
  FROM pt JOIN ppos tp ON tp.term = pt.term
),
occ AS (
  SELECT h.phrase_id, h.doc_id, h.start
  FROM hits h JOIN plen l ON l.phrase_id = h.phrase_id
  GROUP BY h.phrase_id, h.doc_id, h.start, l.len
  HAVING count(*) = l.len
),
res AS (SELECT phrase_id::BIGINT AS phrase_id, doc_id::BIGINT AS doc_id,
               count(*)::BIGINT AS ptf
        FROM occ GROUP BY 1, 2)
SELECT {_cksum_exprs('phrase_id', 'doc_id', 'ptf')} FROM res
""").df().iloc[0]
    check("phrase_match_1m", eng_ph,
          {k: int(ora_ph_row[k]) for k in eng_ph})

    # -- search_facets at 1M (site facet, full-match-set counts) ------------
    t_step = time.time()
    from dint_spark.facets import (build_doc_facets, build_doc_values,
                                   run_collapsed_queries,
                                   run_facet_queries, run_sorted_queries)
    fdocs = docs_sp.select(
        "doc_id",
        F.format_string("site%04d", (F.col("doc_id") % 1000)
                        .cast("int")).alias("site"))
    fac = build_doc_facets(spark, fdocs, idx.num_docs, "site")
    eng_fc = (run_facet_queries(spark, idx, fspecs, fac, mode="and")
              .toPandas().sort_values(["query_id", "facet"])
              .reset_index(drop=True))
    ora_fc = con.sql(prelude + matched_cte + """
SELECT query_id, printf('site%04d', doc_id % 1000) AS facet,
       count(*)::BIGINT AS n_docs
FROM matched GROUP BY 1, 2 ORDER BY 1, 2
""").df()
    check_df("search_facets_1m", eng_fc, ora_fc,
             {"n_queries": len(fspecs)})

    # -- search_multi_terms at 1M (composite-key buckets) -------------------
    t_step = time.time()
    mdocs = docs_sp.select(
        "doc_id",
        F.concat_ws("|",
                    F.format_string("g%d", (F.col("doc_id") % 7)
                                    .cast("int")),
                    F.format_string("l%d", (F.col("doc_id") % 3)
                                    .cast("int"))).alias("gl"))
    mfac = build_doc_facets(spark, mdocs, idx.num_docs, "gl")
    eng_mt = (run_facet_queries(spark, idx, fspecs, mfac, mode="and")
              .select("query_id",
                      F.substring_index("facet", "|", 1).alias("grp"),
                      F.substring_index("facet", "|", -1).alias("lng"),
                      "n_docs")
              .toPandas().sort_values(["query_id", "grp", "lng"])
              .reset_index(drop=True))
    ora_mt = con.sql(prelude + matched_cte + """
SELECT query_id, printf('g%d', doc_id % 7) AS grp,
       printf('l%d', doc_id % 3) AS lng, count(*)::BIGINT AS n_docs
FROM matched GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""").df()
    check_df("search_multi_terms_1m", eng_mt, ora_mt)

    # -- search_sort_by_field at 1M (doc-values sidecar ranking) ------------
    t_step = time.time()
    vals = build_doc_values(
        spark, docs_sp.withColumn("nchars", F.length("text")),
        idx.num_docs, "nchars")
    eng_sf = (run_sorted_queries(spark, idx, fspecs, vals, k=10,
                                 mode="and", descending=True)
              .toPandas().sort_values(["query_id", "rank"])
              .reset_index(drop=True))
    ora_sf = con.sql(prelude + matched_cte + """
SELECT query_id, rank, doc_id, val FROM (
  SELECT m.query_id, m.doc_id, length(i.text)::BIGINT AS val,
         row_number() OVER (
           PARTITION BY m.query_id
           ORDER BY length(i.text) DESC, m.doc_id ASC)::INT AS rank
  FROM matched m JOIN ids i ON i.doc_id = m.doc_id
) WHERE rank <= 10 ORDER BY 1, 2
""").df()
    check_df("search_sort_by_field_1m", eng_sf, ora_sf)

    # -- search_collapse at 1M (one-hit-per-site over the full match set) ---
    t_step = time.time()
    eng_cl = (run_collapsed_queries(spark, idx, fspecs, fac, k=10,
                                    dtype="float64")
              .toPandas().sort_values(["query_id", "rank"])
              .reset_index(drop=True))
    cq_vals = ", ".join(f"({qi}, {t}, 1)" for qi, ts in enumerate(fspecs)
                        for t in ts)
    ora_cl = con.sql(prelude + f"""
, qs(query_id, term_id, qf) AS (VALUES {cq_vals}),
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
  GROUP BY 1, 2
),
sq AS (
  SELECT query_id, doc_id, floor(score * 1e9)::BIGINT AS score_q,
         printf('site%04d', doc_id % 1000) AS facet
  FROM scored
),
reps AS (
  SELECT query_id, doc_id, score_q, facet,
         row_number() OVER (PARTITION BY query_id, facet
                            ORDER BY score_q DESC, doc_id ASC) AS gr
  FROM sq
)
SELECT query_id, rank, facet, doc_id, score_q FROM (
  SELECT query_id, facet, doc_id, score_q,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, doc_id ASC)::INT AS rank
  FROM reps WHERE gr = 1
) WHERE rank <= 10 ORDER BY 1, 2
""").df()
    check_df("search_collapse_1m", eng_cl, ora_cl)

    # -- search_bool_dsl at 1M (compound eligibility + scoring) -------------
    t_step = time.time()
    from collections import Counter

    from dint_spark.bool_query import BoolSpec, run_bool_queries
    bool_specs = [([0], [3, 5, 7], [], 1), ([], [0, 1, 2], [], 2),
                  ([mid], [], [1], None), ([1, 3], [], [tail], None)]
    eng_bd = (run_bool_queries(
        spark, idx,
        [BoolSpec(m, s, n, ms) for m, s, n, ms in bool_specs],
        k=10, dtype="float64")
        .toPandas().sort_values(["query_id", "rank"])
        .reset_index(drop=True))
    pos_r, must_r, should_r, neg_r, mins_r = [], [], [], [], []
    for qid, (m, s, n, ms) in enumerate(bool_specs):
        qf = Counter(m) + Counter(s)
        pos_r += [f"({qid}, {t}, {c})" for t, c in sorted(qf.items())]
        must_r += [f"({qid}, {t})" for t in sorted(set(m))]
        should_r += [f"({qid}, {t})" for t in sorted(set(s))]
        neg_r += [f"({qid}, {t})" for t in sorted(set(n))]
        if ms is None:
            ms = 0 if m else min(1, len(s))
        mins_r.append(f"({qid}, {ms}, {len(set(m))})")

    def _vals(name, cols, rows):
        return (f"{name}({cols}) AS (VALUES "
                + (", ".join(rows) if rows else "(-1, -1)") + ")")

    ora_bd = con.sql(prelude + f"""
, {_vals("bq_pos", "query_id, term_id, qf", pos_r)},
{_vals("bq_must", "query_id, term_id", must_r)},
{_vals("bq_should", "query_id, term_id", should_r)},
{_vals("bq_neg", "query_id, term_id", neg_r)},
bq_min(query_id, min_should, n_must) AS (VALUES {", ".join(mins_r)}),
bscored AS (
  SELECT p.query_id, tf.doc_id,
         sum(
           p.qf * greatest(1e-6, ln((s.n_docs - v.df + 0.5) / (v.df + 0.5)))
           * (1 + 1.2)
           * (tf.tf / (tf.tf + 1.2 * (0.5 + 0.5 * (dl.len / s.avg_len))))
         ) AS score
  FROM bq_pos p
  JOIN vocab v ON v.term_id = p.term_id
  JOIN tf ON tf.term = v.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
elig AS (
  SELECT b.query_id, b.doc_id
  FROM bscored b JOIN bq_min m ON m.query_id = b.query_id
  WHERE (SELECT count(*) FROM bq_must q
         JOIN vocab v2 ON v2.term_id = q.term_id
         JOIN tf t2 ON t2.term = v2.term AND t2.doc_id = b.doc_id
         WHERE q.query_id = b.query_id) = m.n_must
    AND (SELECT count(*) FROM bq_should q
         JOIN vocab v3 ON v3.term_id = q.term_id
         JOIN tf t3 ON t3.term = v3.term AND t3.doc_id = b.doc_id
         WHERE q.query_id = b.query_id) >= m.min_should
    AND NOT EXISTS (SELECT 1 FROM bq_neg q
         JOIN vocab v4 ON v4.term_id = q.term_id
         JOIN tf t4 ON t4.term = v4.term AND t4.doc_id = b.doc_id
         WHERE q.query_id = b.query_id)
)
SELECT query_id, rank, doc_id, score_q FROM (
  SELECT b.query_id, b.doc_id,
         floor(b.score * 1e9)::BIGINT AS score_q,
         row_number() OVER (
           PARTITION BY b.query_id
           ORDER BY floor(b.score * 1e9) DESC, b.doc_id ASC)::INT AS rank
  FROM bscored b
  JOIN elig e ON e.query_id = b.query_id AND e.doc_id = b.doc_id
) WHERE rank <= 10 ORDER BY 1, 2
""").df()
    check_df("search_bool_dsl_1m", eng_bd, ora_bd)

    # -- span_near at 1M (ordered slop chains, exact checksum) --------------
    t_step = time.time()
    from dint_spark.queries import run_span_near_queries
    # reuse the phrase workload's corpus-drawn word pairs + the head
    # bigram, as ordered pairs with slop 3 (plus one reversed pair)
    span_specs = [[tidmap[p[0]], tidmap[p[1]]] for p in phrases[:4]]
    span_specs.append(list(reversed(span_specs[0])))
    SLOP = 3
    eng_sp = _spark_cksum(
        run_span_near_queries(spark, pos_idx, span_specs, slop=SLOP),
        "query_id", "doc_id", "n_spans")
    sp_terms = sorted({t for s in span_specs for t in s})
    # term_id -> term string via the engine vocab (ids match the oracle
    # vocab by the postings_build_1m check)
    id2t = {int(r["term_id"]): r["term"] for r in
            pos_idx.vocab().where(
                F.col("term_id").isin(sp_terms)).collect()}
    sp_parts = []
    for qid, (t1, t2) in enumerate(span_specs):
        sp_parts.append(f"""
SELECT {qid}::BIGINT AS query_id, doc_id::BIGINT AS doc_id,
       count(*)::BIGINT AS n_spans FROM (
  SELECT c.doc_id, c.p1, min(o.pos) AS p2
  FROM (SELECT doc_id, pos AS p1 FROM spocc
        WHERE term = '{id2t[t1]}') c
  JOIN spocc o ON o.doc_id = c.doc_id AND o.term = '{id2t[t2]}'
            AND o.pos > c.p1
  GROUP BY c.doc_id, c.p1
) WHERE p2 - p1 - 1 <= {SLOP} GROUP BY 2""")
    ora_sp_row = con.sql(f"""
WITH toks_ne AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS ord
    FROM (SELECT doc_id,
                 string_split_regex(lower(text), '[^0-9a-z]+') AS l
          FROM ids)
  ) WHERE term <> ''
),
toks_pos AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos
  FROM toks_ne
),
spocc AS (SELECT * FROM toks_pos WHERE term IN (
  {", ".join(sorted({repr(id2t[t]) for t in sp_terms}))})),
res AS ({" UNION ALL ".join(sp_parts)})
SELECT {_cksum_exprs('query_id', 'doc_id', 'n_spans')} FROM res
""").df().iloc[0]
    check("span_near_1m", eng_sp, {k: int(ora_sp_row[k]) for k in eng_sp})

    # -- highlight at 1M (best-fragment law on the result page) -------------
    t_step = time.time()
    from dint_spark.queries import run_highlight_queries
    hl_specs = [[0, 3], [1, 2, 5], [7, 30]]
    HLK, HLW = 5, 8
    eng_hl = (run_highlight_queries(
        spark, pos_idx, docs_sp, hl_specs, k=HLK, width=HLW)
        .toPandas().sort_values(["query_id", "rank"])
        .reset_index(drop=True))
    hq_vals = ", ".join(f"({qi}, {t}, 1)" for qi, ts in enumerate(hl_specs)
                        for t in ts)
    ora_hl = con.sql(prelude + f"""
, hq(query_id, term_id, qf) AS (VALUES {hq_vals}),
hscored AS (
  SELECT hq.query_id, tf.doc_id,
         sum(
           hq.qf * greatest(1e-6, ln((s.n_docs - v.df + 0.5) / (v.df + 0.5)))
           * (1 + 1.2)
           * (tf.tf / (tf.tf + 1.2 * (0.5 + 0.5 * (dl.len / s.avg_len))))
         ) AS score
  FROM hq
  JOIN vocab v ON v.term_id = hq.term_id
  JOIN tf ON tf.term = v.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
hcand AS (
  SELECT query_id, rank, doc_id, score_q FROM (
    SELECT query_id, doc_id, floor(score * 1e9)::BIGINT AS score_q,
           row_number() OVER (PARTITION BY query_id
             ORDER BY floor(score * 1e9) DESC, doc_id ASC)::INT AS rank
    FROM hscored
  ) WHERE rank <= {HLK}
),
toks_ne AS (
  SELECT doc_id, term, ord FROM (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS ord
    FROM (SELECT i.doc_id,
                 string_split_regex(lower(i.text), '[^0-9a-z]+') AS l
          FROM ids i
          WHERE i.doc_id IN (SELECT doc_id FROM hcand))
  ) WHERE term <> ''
),
toks_pos AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos
  FROM toks_ne
),
hocc AS (
  SELECT c.query_id, c.doc_id, t.pos, v.term_id
  FROM hcand c
  JOIN hq q ON q.query_id = c.query_id
  JOIN vocab v ON v.term_id = q.term_id
  JOIN toks_pos t ON t.doc_id = c.doc_id AND t.term = v.term
),
hwin AS (
  SELECT o1.query_id, o1.doc_id, o1.pos AS start,
         count(DISTINCT o2.term_id) AS n_terms, count(*) AS n_hits
  FROM hocc o1
  JOIN hocc o2 ON o2.query_id = o1.query_id AND o2.doc_id = o1.doc_id
             AND o2.pos >= o1.pos AND o2.pos < o1.pos + {HLW}
  GROUP BY 1, 2, 3
),
hbest AS (
  SELECT query_id, doc_id, start, n_terms, n_hits FROM (
    SELECT query_id, doc_id, start, n_terms, n_hits,
           row_number() OVER (PARTITION BY query_id, doc_id
             ORDER BY n_terms DESC, n_hits DESC, start ASC) AS bn
    FROM hwin
  ) WHERE bn = 1
)
SELECT c.query_id, c.rank, c.doc_id, c.score_q, b.start,
       b.n_terms::INT AS n_terms, b.n_hits::INT AS n_hits,
       (SELECT string_agg(t.term, ' ' ORDER BY t.pos) FROM toks_pos t
        WHERE t.doc_id = b.doc_id AND t.pos >= b.start
          AND t.pos < b.start + {HLW}) AS snippet
FROM hcand c JOIN hbest b ON b.query_id = c.query_id
                         AND b.doc_id = c.doc_id
ORDER BY 1, 2
""").df()
    check_df("search_highlight_1m", eng_hl, ora_hl)

    # -- dedup_minhash on a 100k subset with injected near-dups --------------
    t_step = time.time()
    if not os.path.exists(os.path.join(DOCS, "documents.parquet")):
        ids = spark.read.parquet(PAGES).orderBy("url").limit(
            DEDUP_DOCS).select(
            (F.row_number().over(Window.orderBy("url")) - 1).alias("doc_id"),
            "text")
        dupes = ids.where(F.col("doc_id") < DEDUP_DUPES).select(
            (F.col("doc_id") + DEDUP_DOCS).alias("doc_id"),
            # drop the first token: a guaranteed high-Jaccard near-dup
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"))
        docs = ids.unionByName(dupes).select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("gate1m").alias("source"),
            F.length("text").alias("n_chars"))
        docs.write.mode("overwrite").parquet(
            os.path.join(DOCS, "documents.parquet"))
    from dint_spark.ops.dedup import DEDUP_MINHASH_SQL, dedup_minhash_lsh
    eng_mh = dedup_minhash_lsh(spark, DOCS).toPandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    con2 = duckdb.connect()
    con2.sql(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    con2.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{os.path.join(DOCS, 'documents.parquet')}/*.parquet'")
    ora_mh = con2.sql(DEDUP_MINHASH_SQL).df()  # already ORDER BY doc_a, doc_b
    ok = (list(eng_mh.columns) == list(ora_mh.columns)
          and len(eng_mh) == len(ora_mh)
          and bool((eng_mh.values == ora_mh.values).all()))
    results["dedup_minhash_1m"] = {
        "ok": ok, "rows": [len(eng_mh), len(ora_mh)],
        "subset_docs": DEDUP_DOCS + DEDUP_DUPES,
        "sec": round(time.time() - t_step, 1)}
    print(("PASS " if ok else "FAIL ") + "dedup_minhash_1m",
          results["dedup_minhash_1m"], flush=True)

    # ======================================================================
    # round-4 VERDICT item 7: the three most state-heavy mining/feedback
    # ops, value-verified at 1M (their row-exact evidence stopped at
    # sf0.01). Workloads and oracle SQL come from the driver contract
    # (__spark_entry__) so the 1M check replays EXACTLY the gated logic.
    # ======================================================================
    import __spark_entry__ as E

    def rank_quant_pdf(raw, topk):
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("score_q"), F.asc("doc_id"))
        return (
            raw.withColumn("score_q",
                           F.floor(F.col("score") * 1e9).cast("long"))
            .withColumn("qrank", F.row_number().over(wq))
            .where(F.col("qrank") <= topk)
            .select("query_id", F.col("qrank").cast("int").alias("rank"),
                    "doc_id", "score_q")
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    # -- significant_terms at 1M (JLH over ~400k-doc foregrounds) -----------
    t_step = time.time()
    from dint_spark.mining import significant_terms
    eng_sig = significant_terms(
        spark, idx, E.SIG_SPECS, docs_sp, k=E.SIG_TOPK
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert E._SIG_SQL.startswith(E._PRELUDE)
    ora_sig = con.sql(prelude + E._SIG_SQL[len(E._PRELUDE):]).df()
    check_df("significant_terms_1m", eng_sig, ora_sig)

    # -- RM3 pseudo-relevance feedback at 1M --------------------------------
    t_step = time.time()
    from dint_spark.search import rm3_search
    raw_rm3 = rm3_search(
        spark, idx, E.QUERY_SPECS, docs_sp, fb_docs=E.RM3_FB_DOCS,
        fb_terms=E.RM3_FB_TERMS, orig_weight=E.RM3_A, k=100,
        algo="block_max_wand", dtype="float64")
    eng_rm3 = rank_quant_pdf(raw_rm3, E.TOPK)
    rm3_body = E._rm3_sql()
    assert rm3_body.startswith(E._PRELUDE)
    rm3_body = rm3_body[len(E._PRELUDE):]
    # the sf oracle streams toks2 (every doc's tokens); at 1M tokenize
    # ONLY the feedback candidates — identical rows, 1e5x less work
    rm3_body = rm3_body.replace(
        """ftoks AS (
  SELECT c.query_id, c.doc_id, t.term
  FROM cands c JOIN toks2 t ON t.doc_id = c.doc_id
),""",
        """fd AS (SELECT DISTINCT doc_id FROM cands),
ft0 AS (
  SELECT i.doc_id,
         unnest(string_split_regex(lower(i.text), '[^0-9a-z]+')) AS term
  FROM ids i JOIN fd ON fd.doc_id = i.doc_id
),
ftoks AS (
  SELECT c.query_id, c.doc_id, t.term
  FROM cands c JOIN (SELECT doc_id, term FROM ft0 WHERE term <> '') t
    ON t.doc_id = c.doc_id
),""")
    assert "toks2" not in rm3_body, "feedback tokenization not restricted"
    ora_rm3 = con.sql(prelude + rm3_body).df()
    check_df("search_rm3_1m", eng_rm3, ora_rm3,
             {"n_queries": len(E.QUERY_SPECS)})

    # -- percolation at 1M (corpus-sized result -> order-free checksum) -----
    # the contract's PERC_QUERIES are sf-corpus English words; this corpus
    # is synthetic, so register queries drawn from ITS vocabulary (two
    # mid-df terms AND one head+tail pair per query — real containment
    # sets, not empty-vs-empty)
    t_step = time.time()
    from dint_spark.percolate import percolate, register_queries
    vt = vocab_pdf.sort_values("term_id").reset_index(drop=True)
    terms_by_df = vt.sort_values("df", ascending=False)["term_id"]
    id2term = dict(
        spark.read.parquet(os.path.join(IDX, "vocab.parquet"))
        .select("term_id", "term").toPandas().itertuples(index=False,
                                                         name=None))
    pick = [int(terms_by_df.iloc[i]) for i in
            (0, 5, 200, 1000, 5000, len(terms_by_df) // 2)]
    perc_queries = [f"{id2term[pick[0]]} {id2term[pick[2]]}",
                    f"{id2term[pick[1]]} {id2term[pick[3]]}",
                    f"{id2term[pick[4]]} {id2term[pick[5]]}",
                    f"{id2term[pick[2]]} {id2term[pick[3]]} "
                    f"{id2term[pick[4]]}"]
    reg = register_queries(spark, perc_queries)
    eng_pc = percolate(docs_sp, reg)
    eng_pck = _spark_cksum(
        eng_pc.select("query_id", "doc_id", F.lit(0).alias("z")),
        "query_id", "doc_id", "z")
    con.sql("CREATE OR REPLACE VIEW documents AS "
            "SELECT doc_id, text FROM ids")
    rows_pq = []
    for qid, q in enumerate(perc_queries):
        toks = sorted({t for t in q.lower().split() if t})
        rows_pq += [f"({qid}, '{t}', {len(toks)})" for t in toks]
    ora_pck_row = con.sql(f"""
SELECT {_cksum_exprs('query_id', 'doc_id', '0')} FROM (
  WITH dterms AS (SELECT DISTINCT doc_id, term FROM tf),
  pq(query_id, term, n_terms) AS (VALUES {', '.join(rows_pq)})
  SELECT pq.query_id::BIGINT AS query_id, d.doc_id
  FROM pq JOIN dterms d ON d.term = pq.term
  GROUP BY 1, 2
  HAVING count(*) = any_value(pq.n_terms)
) p""").df().iloc[0]
    check("percolate_docs_1m", eng_pck,
          {k: int(ora_pck_row[k]) for k in eng_pck})

    results["total_s"] = round(time.time() - t_all, 1)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, default=str)
    bad = [k for k, v in results.items()
           if isinstance(v, dict) and v.get("ok") is False]
    print(f"{'ALL PASS' if not bad else 'FAILING: ' + ', '.join(bad)} "
          f"-> {out_json}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

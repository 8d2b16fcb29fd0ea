"""Ranking evaluation (the ES Ranking Evaluation API / `_rank_eval`):
precision@k, MRR and NDCG@k of a retrieval run against graded
judgments, all in exact integer arithmetic.

Model: the system run is the engine's quantized BM25 block-max-WAND
top-k; the judgment set is conjunctive — a doc is judged relevant for a
query iff it matches EVERY distinct query term (an AND over the
index's own postings), graded rel = min(3, sum of the matched term
frequencies). Metrics per query:

  p_at_k_x  = hits_in_top_k * (10^6 / k)
  mrr_x     = 10^6 div (first relevant rank), 0 if none
  dcg_x     = sum over top-k of rel[rank] * D[rank]
  idcg_x    = the same sum over the ideal ordering (rel desc) of the
              full judged set, truncated at k
  ndcg_x    = (10^6 * dcg_x) div idcg_x, 0 when idcg_x = 0

where D[r] = round(10^6 / log2(r+1)) is an integer discount table
(module constant). Every metric is integer math end-to-end, so the
DuckDB oracle reproduces the rows bit-exactly — no cross-engine libm
log2 in the compared values.

Scale shape: the run is k rows per query; judgments come from ONE
broadcast join of the (tiny) query-term table against the decoded
postings OF THOSE TERMS ONLY (the term subset pushes into the segments
parquet scan — a 6-query judgment never decodes the index) with a
map-side-combined groupBy — no per-doc window anywhere.
IDCG folds the judged set to a 3-bucket rel histogram per query
(map-side partial agg) and evaluates the truncated ideal DCG from
discount prefix sums, so the ideal ranking is never materialized: at
10^12 docs the shuffle carries (query, rel)-count rows, not matched
docs.

No reference counterpart: the reference engine stops at retrieval
(include/ds2i/queries.hpp:34-130); evaluation is engine-completeness
scope (the web-search surface a reference user gets from ES/Lucene
tooling).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dint_spark.queries import decoded_postings, run_queries

MAX_REL = 3

# D[r] = round(1e6 / log2(r+1)), 1-indexed; P = prefix sums, P[0] = 0
DISCOUNTS_X = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 51)]
_PREFIX_X = [0]
for _d in DISCOUNTS_X:
    _PREFIX_X.append(_PREFIX_X[-1] + _d)


def judged_rel(spark: SparkSession, idx, specs: list[list[int]]) -> DataFrame:
    """(query_id, doc_id, rel): conjunctive judgments over the index's
    decoded postings — rel = min(MAX_REL, sum tf) for docs matching all
    distinct query terms."""
    qrows = [(qid, int(t)) for qid, terms in enumerate(specs)
             for t in sorted(set(terms))]
    qdf = spark.createDataFrame(qrows, "query_id int, term_id long")
    nq = spark.createDataFrame(
        [(qid, len(set(terms))) for qid, terms in enumerate(specs)],
        "query_id int, n_terms long")
    all_terms = sorted({t for _, t in qrows})
    return (decoded_postings(idx, term_ids=all_terms)
            .join(F.broadcast(qdf), "term_id")
            .groupBy("query_id", "doc_id")
            .agg(F.count("*").alias("m"), F.sum("freq").alias("tf_sum"))
            .join(F.broadcast(nq), "query_id")
            .where(F.col("m") == F.col("n_terms"))
            .select("query_id", "doc_id",
                    F.least(F.lit(MAX_REL), F.col("tf_sum"))
                    .cast("long").alias("rel")))


def run_rank_eval(spark: SparkSession, idx, specs: list[list[int]],
                  k: int = 10) -> DataFrame:
    """Per-query metric row: (query_id, p_at_k_x, mrr_x, dcg_x, idcg_x,
    ndcg_x). ``k`` must divide 10^6 so p@k stays integral."""
    assert 1_000_000 % k == 0 and k <= len(DISCOUNTS_X)
    raw = run_queries(spark, idx, specs, algo="block_max_wand", k=100,
                      dtype="float64")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("doc_id"))
    run = (raw.withColumn("score_q",
                          F.floor(F.col("score") * 1e9).cast("long"))
           .withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select("query_id", "rank", "doc_id"))
    judged = judged_rel(spark, idx, specs)

    disc = F.array(*[F.lit(d) for d in DISCOUNTS_X[:k]])
    hits = (run.join(judged, ["query_id", "doc_id"], "left")
            .fillna({"rel": 0}))
    perq = hits.groupBy("query_id").agg(
        (F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
         * F.lit(1_000_000 // k)).cast("long").alias("p_at_k_x"),
        F.max(F.when(F.col("rel") > 0,
                     F.expr("CAST(1000000 AS BIGINT) div rank"))
              .otherwise(0)).cast("long").alias("mrr_x"),
        F.sum(F.col("rel") * F.element_at(disc, F.col("rank")))
        .cast("long").alias("dcg_x"),
    )

    # ideal DCG from the rel histogram: c_g docs at each grade g, filled
    # greedily rel-desc into ranks 1..k; sum(D[a+1..b]) = P[b] - P[a]
    pref = F.array(*[F.lit(p) for p in _PREFIX_X[:k + 1]])
    hist = (judged.groupBy("query_id")
            .agg(*[F.sum(F.when(F.col("rel") == g, 1).otherwise(0))
                   .cast("int").alias(f"c{g}")
                   for g in range(1, MAX_REL + 1)]))
    cum, idcg = F.lit(0), F.lit(0).cast("long")
    for g in range(MAX_REL, 0, -1):
        nxt = F.least(F.lit(k), cum + F.col(f"c{g}")).cast("int")
        idcg = idcg + F.lit(g) * (F.element_at(pref, nxt + 1)
                                  - F.element_at(pref, cum + 1))
        cum = nxt
    ideal = hist.select("query_id", idcg.cast("long").alias("idcg_x"))

    return (perq.join(ideal, "query_id", "full")
            .fillna(0)
            .select("query_id", "p_at_k_x", "mrr_x", "dcg_x", "idcg_x",
                    F.when(F.col("idcg_x") == 0, F.lit(0).cast("long"))
                    .otherwise(F.expr(
                        "CAST(1000000 AS BIGINT) * dcg_x div idcg_x"))
                    .alias("ndcg_x")))


def rank_eval_sql(prelude: str, q_values: str, topk: int = 10) -> str:
    """DuckDB oracle: the same metrics from the same run + judgments,
    formulated the obvious way (row_number ideal ordering) — the values
    must match the histogram formulation exactly."""
    d_case = " ".join(f"WHEN {r + 1} THEN {d}"
                      for r, d in enumerate(DISCOUNTS_X[:topk]))
    return (
        prelude
        + f"""
, {q_values},
scored AS (
  SELECT qs.query_id, tf.doc_id,
         sum(
           qs.qf * greatest(1e-6, ln((s.n_docs - v.df + 0.5) / (v.df + 0.5))) * (1 + 1.2)
           * (tf.tf / (tf.tf + 1.2 * (0.5 + 0.5 * (dl.len / s.avg_len))))
         ) AS score
  FROM qs
  JOIN vocab v ON v.term_id = qs.term_id
  JOIN tf ON tf.term = v.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
run AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT r.query_id, r.doc_id,
           row_number() OVER (
             PARTITION BY r.query_id
             ORDER BY floor(r.score * 1e9) DESC, r.doc_id ASC
           )::INT AS rank
    FROM scored r
  ) WHERE rank <= {topk}
),
jt AS (SELECT DISTINCT query_id, term_id FROM qs),
nq AS (SELECT query_id, count(*) AS n_terms FROM jt GROUP BY 1),
jm AS (
  SELECT j.query_id, tf.doc_id, count(*) AS m, sum(tf.tf) AS tf_sum
  FROM jt j
  JOIN vocab v ON v.term_id = j.term_id
  JOIN tf ON tf.term = v.term
  GROUP BY 1, 2
),
judged AS (
  SELECT jm.query_id, jm.doc_id, least({MAX_REL}, tf_sum)::BIGINT AS rel
  FROM jm JOIN nq ON nq.query_id = jm.query_id
  WHERE jm.m = nq.n_terms
),
hits AS (
  SELECT r.query_id, r.rank, coalesce(j.rel, 0) AS rel
  FROM run r LEFT JOIN judged j
    ON j.query_id = r.query_id AND j.doc_id = r.doc_id
),
perq AS (
  SELECT query_id,
         (sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
          * {1_000_000 // topk})::BIGINT AS p_at_k_x,
         coalesce(max(CASE WHEN rel > 0 THEN 1000000 // rank END),
                  0)::BIGINT AS mrr_x,
         sum(rel * CASE rank {d_case} END)::BIGINT AS dcg_x
  FROM hits GROUP BY 1
),
ideal AS (
  SELECT query_id, sum(rel * CASE irank {d_case} END)::BIGINT AS idcg_x
  FROM (
    SELECT query_id, rel,
           row_number() OVER (
             PARTITION BY query_id ORDER BY rel DESC, doc_id ASC
           ) AS irank
    FROM judged
  ) WHERE irank <= {topk}
  GROUP BY 1
)
SELECT p.query_id, p.p_at_k_x, p.mrr_x, p.dcg_x,
       coalesce(i.idcg_x, 0) AS idcg_x,
       CASE WHEN coalesce(i.idcg_x, 0) = 0 THEN 0
            ELSE (1000000 * p.dcg_x) // i.idcg_x END::BIGINT AS ndcg_x
FROM perq p LEFT JOIN ideal i ON i.query_id = p.query_id
ORDER BY p.query_id
"""
    )

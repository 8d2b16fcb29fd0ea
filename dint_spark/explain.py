"""Score explanation: per-term BM25 breakdown for each top-k hit — the
ES ``_explain`` / Lucene ``Explanation`` API, the tool users reach for
when a ranking surprises them.

For every (query, top-k doc, matched term) the op emits the exact
ingredients (tf, df, doc len) and the term's quantized score
contribution; the sum of a doc's contributions reproduces its ranked
score up to the quantization the ranked surface already exposes. One
kernel pass: the top-k selection is the same exact compacted scoring
used by collapse/pagination (queries.matched_scores), and the per-term
tf lookups are |k| searchsorted probes per list — no second decode, no
per-doc Python. Output is |queries| x k x |terms| rows, driver-trivial.

No reference counterpart: fanhualta/dint returns scores only
(include/ds2i/queries.hpp); explanation is engine-completeness scope
(the builder brief's web-search surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.queries import (
    DocMask,
    _live_bc,
    _pruned_segments,
    _BM25_SEG_COLS,
    build_cursors,
    matched_scores,
    shared_index_bc,
)

EXPLAIN_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term_id", T.LongType(), False),
    T.StructField("tf", T.LongType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("contrib_q", T.LongType(), False),
])


def run_queries_explain(
    spark: SparkSession, index, queries, k: int = 10,
    dtype: str = "float64", quant: float = 1e9,
    doc_filter: DocMask | None = None,
) -> DataFrame:
    """Top-``k`` docs per query by quantized BM25 (the ranked-surface
    order), exploded into one row per matched query term with its exact
    (tf, df) and quantized contribution floor(qw * dtw * quant). Terms
    the doc does not contain emit no row (their contribution is 0).
    Returns (query_id, rank, doc_id, term_id, tf, df, contrib_q)."""
    local_terms = sorted({int(t) for ts in queries for t in ts})
    qdf = spark.createDataFrame(
        [(i, [int(t) for t in ts]) for i, ts in enumerate(queries)],
        schema=T.StructType([
            T.StructField("query_id", T.LongType(), False),
            T.StructField("terms", T.ArrayType(T.LongType()), False),
        ]),
    )
    num_docs = index.num_docs
    DT = np.float32 if dtype == "float32" else np.float64
    norms = index.norm_lens if dtype == "float32" else index.norm_lens64
    norm_bc = shared_index_bc(spark, index, f"norms-{dtype}",
                              lambda: norms)
    docs_dict_bc = shared_index_bc(spark, index, "docs_dict",
                                   lambda: index.docs_dict)
    freqs_dict_bc = shared_index_bc(spark, index, "freqs_dict",
                                    lambda: index.freqs_dict)
    tomb_bc = _live_bc(spark, index, doc_filter)

    qterms = (
        qdf.select("query_id", F.explode("terms").alias("term_id"))
        .groupBy("query_id", "term_id")
        .agg(F.count("*").alias("qf"))
    )
    joined = qterms.join(
        _pruned_segments(index, qterms, local_terms).select(*_BM25_SEG_COLS),
        "term_id")

    def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "rank", "doc_id", "term_id", "tf", "df",
                "contrib_q"]
        if not len(pdf):
            return pd.DataFrame(columns=cols)
        qid = int(pdf["query_id"].iloc[0])
        # global df per term = sum over its segment-chunk rows; cursors
        # merge chunks so each term probes as ONE sorted list
        df_map = pdf.groupby("term_id")["n"].sum().to_dict()
        cursors = build_cursors(pdf, docs_dict_bc.value,
                                freqs_dict_bc.value, num_docs, DT,
                                merge_chunks=True)
        union, scores = matched_scores(
            cursors, norm_bc.value, num_docs, DT,
            live=tomb_bc.value if tomb_bc is not None else None)
        if not len(union):
            return pd.DataFrame(columns=cols)
        sq = np.floor(scores.astype(np.float64) * quant).astype(np.int64)
        if len(union) > 4 * k and k > 0:
            thr = -np.partition(-sq, k - 1)[k - 1]
            sel = np.flatnonzero(sq >= thr)
            union, sq = union[sel], sq[sel]
        order = np.lexsort((union, -sq))[:k]
        top_docs = union[order].astype(np.int64)
        ranks = np.arange(1, len(order) + 1, dtype=np.int32)
        nl = np.asarray(norm_bc.value)[top_docs].astype(DT, copy=False)
        out = {c: [] for c in cols}
        for c in cursors:  # term_id asc
            docs, freqs = c.decode_all()
            pos = np.searchsorted(docs, top_docs)
            pos_c = np.minimum(pos, len(docs) - 1)
            hit = docs[pos_c] == top_docs
            if not hit.any():
                continue
            f = freqs[pos_c[hit]].astype(DT)
            dtw = f / (f + DT(1.2) * (DT(1.0) - DT(0.5)
                                      + DT(0.5) * nl[hit]))
            contrib = np.floor(
                (c.q_weight * dtw).astype(np.float64) * quant
            ).astype(np.int64)
            out["query_id"].append(np.full(int(hit.sum()), qid,
                                           dtype=np.int64))
            out["rank"].append(ranks[hit])
            out["doc_id"].append(top_docs[hit])
            out["term_id"].append(np.full(int(hit.sum()),
                                          int(c.term_id),
                                          dtype=np.int64))
            out["tf"].append(freqs[pos_c[hit]].astype(np.int64))
            out["df"].append(np.full(int(hit.sum()),
                                     int(df_map[c.term_id]),
                                     dtype=np.int64))
            out["contrib_q"].append(contrib)
        if not out["doc_id"]:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame({c: np.concatenate(v)
                             for c, v in out.items()})

    return joined.groupBy("query_id").applyInPandas(run_one,
                                                    EXPLAIN_SCHEMA)

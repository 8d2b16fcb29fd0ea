"""The compound boolean query DSL: must / should / must_not /
minimum_should_match in one scored retrieval pass — the ES ``bool``
query, the composition every real search front end sends.

Semantics (the ES contract):
  - a doc is eligible iff it contains EVERY ``must`` term, at least
    ``min_should`` of the ``should`` terms, and NO ``must_not`` term;
  - ``min_should`` defaults to 1 when the query has no ``must`` clause
    (pure should = an OR that must match something) and to 0 otherwise;
  - the score is the BM25 sum over the doc's matched must AND should
    terms (must_not never scores).

Kernel shape: one applyInPandas group per query over the pruned
segment rows (the run_queries plumbing). All clause lists decode once
(worker LRU), eligibility is three vectorized membership counts over
the sorted match union (searchsorted scatter-adds — no per-doc Python),
and scoring reuses the exact compacted accumulation shared with
ranked_or/collapse/pagination (queries._compacted_scores), so scores
are bit-identical to ranked_or over the same term multiset. Selection
runs in floor(score*quant) integer space for cross-host and SQL-oracle
reproducibility. Only |queries| x k rows leave the workers.

At 10^12 docs this composes like every other kernel op: per-shard
num_docs bounds the arrays, docid sharding fans out via the existing
sharded runners, and must_not lists are decoded but never scored —
their cost is the same O(postings) any filter pays.

No reference counterpart: fanhualta/dint stops at single-clause
AND/OR (include/ds2i/queries.hpp:34-130); the compound DSL is
engine-completeness scope (builder brief web-search surface).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.queries import (
    DocMask,
    _compacted_scores,
    _live_bc,
    _pruned_segments,
    _BM25_SEG_COLS,
    build_cursors,
    shared_index_bc,
)

BOOL_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score_q", T.LongType(), False),
])


class BoolSpec:
    """One compound query: term-id lists per clause. ``min_should=None``
    applies the ES default (1 without must, 0 with)."""

    __slots__ = ("must", "should", "must_not", "min_should")

    def __init__(self, must=(), should=(), must_not=(),
                 min_should: int | None = None):
        self.must = [int(t) for t in must]
        self.should = [int(t) for t in should]
        self.must_not = [int(t) for t in must_not]
        if not self.must and not self.should:
            raise ValueError(
                "bool query needs at least one scoring clause "
                "(must_not alone is filter-only — ES match_all scope)")
        if min_should is None:
            min_should = 0 if self.must else min(1, len(self.should))
        if min_should > len(self.should):
            raise ValueError(
                f"min_should {min_should} > |should| {len(self.should)}")
        self.min_should = int(min_should)


def run_bool_queries(
    spark: SparkSession, index, specs: list[BoolSpec], k: int = 10,
    dtype: str = "float64", quant: float = 1e9,
    doc_filter: DocMask | None = None,
) -> DataFrame:
    """Top-``k`` per compound query by (score_q desc, doc_id asc).
    Returns (query_id, rank, doc_id, score_q)."""
    specs = [s if isinstance(s, BoolSpec) else BoolSpec(*s) for s in specs]
    # all clauses feed the same qterms scan; clause membership rides a
    # broadcast per-query map (term multisets, clause-disjoint qf counts)
    rows = []
    clause_map = {}
    for qid, s in enumerate(specs):
        qf = Counter(s.must) + Counter(s.should)
        for t in set(s.must_not) - set(qf):
            qf[t] = 1  # weight unused for pure-negative terms
        rows += [(qid, int(t), int(c)) for t, c in sorted(qf.items())]
        clause_map[qid] = (frozenset(s.must), frozenset(s.should),
                           frozenset(s.must_not), s.min_should)
    local_terms = sorted({t for _, t, _ in rows})
    qterms = spark.createDataFrame(
        rows,
        schema=T.StructType([
            T.StructField("query_id", T.LongType(), False),
            T.StructField("term_id", T.LongType(), False),
            T.StructField("qf", T.LongType(), False),
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
    clause_bc = spark.sparkContext.broadcast(clause_map)

    joined = qterms.join(
        _pruned_segments(index, qterms, local_terms).select(*_BM25_SEG_COLS),
        "term_id")

    def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "rank", "doc_id", "score_q"]
        if not len(pdf):
            return pd.DataFrame(columns=cols)
        qid = int(pdf["query_id"].iloc[0])
        must, should, neg, min_should = clause_bc.value[qid]
        cursors = build_cursors(pdf, docs_dict_bc.value,
                                freqs_dict_bc.value, num_docs, DT)
        # a must term whose posting list is absent can never be satisfied
        if len({c.term_id for c in cursors} & must) < len(must):
            return pd.DataFrame(columns=cols)
        pos_lists, must_lists, should_lists, neg_docs = [], [], [], []
        for c in cursors:  # term_id asc — canonical accumulation order
            docs, freqs = c.decode_all()
            if c.term_id in must or c.term_id in should:
                pos_lists.append((c, docs, freqs))
            # a term in BOTH clauses counts toward both (ES: each clause
            # it appears in is satisfied by the same match)
            if c.term_id in must:
                must_lists.append(docs)
            if c.term_id in should:
                should_lists.append(docs)
            if c.term_id in neg:
                neg_docs.append(docs)
        if not pos_lists:
            return pd.DataFrame(columns=cols)
        live = tomb_bc.value if tomb_bc is not None else None
        union, scores = _compacted_scores(pos_lists, norm_bc.value, DT,
                                          live)
        # vectorized clause counts over the sorted union
        mc = np.zeros(len(union), dtype=np.int32)
        for d in must_lists:
            if live is not None:
                d = d[live.mask[d]]
            mc[np.searchsorted(union, d)] += 1
        sc = np.zeros(len(union), dtype=np.int32)
        for d in should_lists:
            if live is not None:
                d = d[live.mask[d]]
            sc[np.searchsorted(union, d)] += 1
        ok = (mc == len(must)) & (sc >= min_should)
        if neg_docs:
            ok &= ~np.isin(union, np.concatenate(neg_docs))
        docs, sq = union[ok], np.floor(
            scores[ok].astype(np.float64) * quant).astype(np.int64)
        if len(docs) > 4 * k and k > 0:
            # O(n) preselect, k-th-value ties kept (paging contract)
            thr = -np.partition(-sq, k - 1)[k - 1]
            sel = np.flatnonzero(sq >= thr)
            docs, sq = docs[sel], sq[sel]
        order = np.lexsort((docs, -sq))[:k]
        return pd.DataFrame({
            "query_id": qid,
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "doc_id": docs[order].astype(np.int64),
            "score_q": sq[order],
        })

    return joined.groupBy("query_id").applyInPandas(run_one, BOOL_SCHEMA)


def run_boosting_queries(
    spark: SparkSession, index, specs: list, negative_boost: float = 0.25,
    k: int = 10, dtype: str = "float64", quant: float = 1e9,
    doc_filter: DocMask | None = None,
) -> DataFrame:
    """The ES ``boosting`` query: docs are retrieved and scored by the
    POSITIVE clause (BM25 over its term multiset — ranked-OR semantics),
    and any doc also matching the NEGATIVE clause (containing ANY of its
    terms) keeps its place in the result set but with its score
    multiplied by ``negative_boost`` — demotion, not exclusion (that is
    must_not's job). ``specs``: (positive_terms, negative_terms) pairs.
    Selection in floor(score*quant) integer space.

    Kernel shape: the bool kernel's decode + compacted scoring pass for
    the positive terms; negative lists mark the union via one
    concatenate + isin over their doc ids (decoded through the worker
    LRU's fused-lane pass — both streams decode together, only the doc
    lane is consumed). Returns (query_id, rank, doc_id, score_q)."""
    import numpy as np

    nb = float(negative_boost)
    rows = []
    neg_map = {}
    for qid, (pos, neg) in enumerate(specs):
        qf = Counter(int(t) for t in pos)
        for t in set(int(x) for x in neg) - set(qf):
            qf[t] = 1  # decoded for the mark, never scored
        rows += [(qid, int(t), int(c)) for t, c in sorted(qf.items())]
        neg_map[qid] = (frozenset(int(t) for t in pos),
                        frozenset(int(t) for t in neg))
    local_terms = sorted({t for _, t, _ in rows})
    qterms = spark.createDataFrame(
        rows,
        schema=T.StructType([
            T.StructField("query_id", T.LongType(), False),
            T.StructField("term_id", T.LongType(), False),
            T.StructField("qf", T.LongType(), False),
        ]))
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
    clause_bc = spark.sparkContext.broadcast(neg_map)
    joined = qterms.join(
        _pruned_segments(index, qterms, local_terms).select(*_BM25_SEG_COLS),
        "term_id")

    def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "rank", "doc_id", "score_q"]
        if not len(pdf):
            return pd.DataFrame(columns=cols)
        qid = int(pdf["query_id"].iloc[0])
        pos, neg = clause_bc.value[qid]
        cursors = build_cursors(pdf, docs_dict_bc.value,
                                freqs_dict_bc.value, num_docs, DT)
        live = tomb_bc.value if tomb_bc is not None else None
        pos_lists, neg_docs = [], []
        for c in cursors:
            if c.term_id in pos:
                docs, freqs = c.decode_all()
                pos_lists.append((c, docs, freqs))
            if c.term_id in neg:
                neg_docs.append(c.decode_all()[0])
        if not pos_lists:
            return pd.DataFrame(columns=cols)
        union, scores = _compacted_scores(pos_lists, norm_bc.value, DT,
                                          live)
        mult = np.ones(len(union), dtype=np.float64)
        if neg_docs:
            mult[np.isin(union, np.concatenate(neg_docs))] = nb
        sq = np.floor(scores.astype(np.float64) * mult
                      * quant).astype(np.int64)
        if len(union) > 4 * k and k > 0:
            thr = -np.partition(-sq, k - 1)[k - 1]
            sel = np.flatnonzero(sq >= thr)
            union, sq = union[sel], sq[sel]
        order = np.lexsort((union, -sq))[:k]
        return pd.DataFrame({
            "query_id": qid,
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "doc_id": union[order].astype(np.int64),
            "score_q": sq[order],
        })

    return joined.groupBy("query_id").applyInPandas(run_one, BOOL_SCHEMA)


def run_terms_set_queries(
    spark: SparkSession, index, specs: list, values, k: int = 10,
    dtype: str = "float64", quant: float = 1e9,
    doc_filter: DocMask | None = None,
) -> DataFrame:
    """The ES ``terms_set`` query: a doc matches when it contains at
    least REQUIRED(doc) of the spec's terms, where the required count
    comes from a PER-DOC numeric field (``minimum_should_match_field``)
    — the per-doc generalization of bool minimum_should_match. Docs
    whose required value is missing or < 1, or exceeds the number of
    terms they match, never match (a required count above the spec's
    term count is unsatisfiable — ES's documented behavior). The score
    is the BM25 sum over the doc's matched terms (each distinct term
    once), selected in floor(score*quant) integer space.

    Kernel shape: identical to run_bool_queries (decode once, one
    compacted scoring pass, one vectorized membership count over the
    match union) plus one doc-values lookup for the per-doc threshold;
    the i64 sidecar ships once per worker like norm_lens. Returns
    (query_id, rank, doc_id, score_q)."""
    import numpy as np

    num_docs = index.num_docs
    if len(values) != num_docs:
        raise ValueError(
            f"values cover {len(values)} docs, index has {num_docs}")
    rows = [(qid, int(t), 1) for qid, ts in enumerate(specs)
            for t in sorted(set(int(x) for x in ts))]
    local_terms = sorted({t for _, t, _ in rows})
    qterms = spark.createDataFrame(
        rows,
        schema=T.StructType([
            T.StructField("query_id", T.LongType(), False),
            T.StructField("term_id", T.LongType(), False),
            T.StructField("qf", T.LongType(), False),
        ]))
    DT = np.float32 if dtype == "float32" else np.float64
    norms = index.norm_lens if dtype == "float32" else index.norm_lens64
    norm_bc = shared_index_bc(spark, index, f"norms-{dtype}",
                              lambda: norms)
    docs_dict_bc = shared_index_bc(spark, index, "docs_dict",
                                   lambda: index.docs_dict)
    freqs_dict_bc = shared_index_bc(spark, index, "freqs_dict",
                                    lambda: index.freqs_dict)
    tomb_bc = _live_bc(spark, index, doc_filter)
    vals_bc = spark.sparkContext.broadcast(
        np.ascontiguousarray(values, dtype=np.int64))
    joined = qterms.join(
        _pruned_segments(index, qterms, local_terms).select(*_BM25_SEG_COLS),
        "term_id")

    def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "rank", "doc_id", "score_q"]
        if not len(pdf):
            return pd.DataFrame(columns=cols)
        qid = int(pdf["query_id"].iloc[0])
        cursors = build_cursors(pdf, docs_dict_bc.value,
                                freqs_dict_bc.value, num_docs, DT)
        live = tomb_bc.value if tomb_bc is not None else None
        pos_lists = []
        for c in cursors:
            docs, freqs = c.decode_all()
            pos_lists.append((c, docs, freqs))
        if not pos_lists:
            return pd.DataFrame(columns=cols)
        union, scores = _compacted_scores(pos_lists, norm_bc.value, DT,
                                          live)
        mc = np.zeros(len(union), dtype=np.int64)
        for _, d, _ in pos_lists:
            if live is not None:
                d = d[live.mask[d]]
            mc[np.searchsorted(union, d)] += 1
        req = vals_bc.value[union]
        ok = (req >= 1) & (mc >= req)
        docs, sq = union[ok], np.floor(
            scores[ok].astype(np.float64) * quant).astype(np.int64)
        if len(docs) > 4 * k and k > 0:
            thr = -np.partition(-sq, k - 1)[k - 1]
            sel = np.flatnonzero(sq >= thr)
            docs, sq = docs[sel], sq[sel]
        order = np.lexsort((docs, -sq))[:k]
        return pd.DataFrame({
            "query_id": qid,
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "doc_id": docs[order].astype(np.int64),
            "score_q": sq[order],
        })

    return joined.groupBy("query_id").applyInPandas(run_one, BOOL_SCHEMA)

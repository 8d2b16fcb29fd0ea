"""Brute-force pins for the second-pass search ops that previously had
only DuckDB gate coverage: boosting, pinned, gauss decay, terms_set,
exact cardinality, and rank_feature. Each test recomputes the expected
result locally from the token matrix + float64 BM25 (the engine's
constants) on a constructed corpus, covering the edge cases the gate's
single fixture shape cannot: negative-clause overlap with the positive
clause, pin-dedup and unmatched pins, the v == pivot saturation point,
per-doc thresholds of 0 / oversize / missing, and empty match sets.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dint_spark.queries import DocMask

from test_facets_rerank import (_brute_bm25_scores, _tok_matrix,  # noqa: F401
                                _vocab_map, docs_pdf, sidx)

N_DOCS = 300


def _doc_values(spark, sidx, docs_pdf):
    """nchars doc values with every-11th doc missing (the facets-test
    shape) -> (engine array, local want array)."""
    import pyspark.sql.functions as F

    from dint_spark.facets import _DV_MISSING, build_doc_values

    docs = spark.createDataFrame(docs_pdf).withColumn(
        "nchars",
        F.when(F.col("doc_id") % 11 == 3, F.lit(None))
        .otherwise(F.length("text")))
    vals = build_doc_values(spark, docs, sidx.num_docs, "nchars")
    return vals, _DV_MISSING


def test_run_rank_feature_matches_brute(spark, sidx, docs_pdf):
    """rank_feature saturation == brute force: BM25 + boost*v/(v+pivot)
    for valued docs, +0 for missing; pivot chosen so at least one doc
    sits exactly at v == pivot (saturation exactly 0.5)."""
    from dint_spark.facets import run_rank_feature_queries

    vals, MISS = _doc_values(spark, sidx, docs_pdf)
    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    # pivot = a real doc value -> exercises the v == pivot == 0.5 point
    pivot = float(next(int(v) for d, v in enumerate(vals)
                       if v != MISS and 0 in tm[d]))
    boost, k = 2.0, 6
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[::2] = True
    dm = DocMask.from_mask(mask)
    specs = [[0], [1, 2], [0, 3, 5], [4], [38, 39]]
    for filt in (None, dm):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
            for r in run_rank_feature_queries(
                spark, sidx, specs, vals, boost=boost, pivot=pivot,
                k=k, doc_filter=filt).collect()
        }
        want = {}
        for qid, terms in enumerate(specs):
            scores = _brute_bm25_scores(docs_pdf, vocab, terms)
            rows = []
            for d, s in scores.items():
                if filt is not None and not mask[d]:
                    continue
                add = (0.0 if vals[d] == MISS
                       else boost * (float(vals[d])
                                     / (float(vals[d]) + pivot)))
                rows.append((-math.floor((s + add) * 1e9), d))
            rows.sort()
            for i, (nsq, d) in enumerate(rows[:k], 1):
                want[(qid, i)] = (d, -nsq)
        assert got == want, filt is None
    # the saturation contract: the pivot-valued doc's addend is exactly
    # boost/2 (float64-exact because v == pivot)
    assert boost * (pivot / (pivot + pivot)) == boost / 2


def test_run_decay_matches_brute(spark, sidx, docs_pdf):
    """Gauss decay == brute force: mult decay exactly at distance scale
    past offset, neutral 1.0 for missing values, and a v == origin doc
    (mult exactly 1.0)."""
    from dint_spark.facets import run_decay_queries

    vals, MISS = _doc_values(spark, sidx, docs_pdf)
    vocab = _vocab_map(spark, sidx)
    origin = float(next(int(v) for v in vals if v != MISS))
    scale, decay, offset, k = 40.0, 0.5, 5.0, 6
    lam = -math.log(decay) / scale ** 2
    specs = [[0], [1, 2], [0, 3, 5], [4]]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
        for r in run_decay_queries(
            spark, sidx, specs, vals, origin=origin, scale=scale,
            decay=decay, offset=offset, k=k).collect()
    }
    want = {}
    for qid, terms in enumerate(specs):
        scores = _brute_bm25_scores(docs_pdf, vocab, terms)
        rows = []
        for d, s in scores.items():
            if vals[d] == MISS:
                m = 1.0
            else:
                dist = max(abs(float(vals[d]) - origin) - offset, 0.0)
                m = math.exp(-(dist * dist) * lam)
            rows.append((-math.floor(s * m * 1e9), d))
        rows.sort()
        for i, (nsq, d) in enumerate(rows[:k], 1):
            want[(qid, i)] = (d, -nsq)
    assert got == want
    with pytest.raises(ValueError):
        run_decay_queries(spark, sidx, specs, vals, origin=0.0,
                          scale=1.0, decay=1.5)


def test_run_cardinality_matches_brute(spark, sidx, docs_pdf):
    """Exact cardinality agg == brute force: n_docs counts every
    matched doc (missing values included), n_distinct counts distinct
    values among valued matches only; AND and OR match modes; DocMask
    composed; an unsatisfiable AND yields no row."""
    from dint_spark.facets import run_cardinality_queries

    vals, MISS = _doc_values(spark, sidx, docs_pdf)
    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[1::3] = True
    dm = DocMask.from_mask(mask)
    specs = [[0], [1, 2], [0, 3, 5], [38, 39], [2]]
    for mode in ("and", "or"):
        for filt in (None, dm):
            got = {
                r["query_id"]: (r["n_docs"], r["n_distinct"])
                for r in run_cardinality_queries(
                    spark, sidx, specs, vals, mode=mode,
                    doc_filter=filt).collect()
            }
            want = {}
            for qid, terms in enumerate(specs):
                ts = set(terms)
                docs = [d for d, dts in enumerate(tm)
                        if (ts <= dts if mode == "and" else ts & dts)
                        and (filt is None or mask[d])]
                if not docs:
                    continue  # empty match set -> no output row
                vv = {int(vals[d]) for d in docs if vals[d] != MISS}
                want[qid] = (len(docs), len(vv))
            assert got == want, (mode, filt is None)


def test_run_boosting_matches_brute(spark, sidx, docs_pdf):
    """ES boosting query == brute force: score from the POSITIVE term
    multiset only (ranked-OR), x negative_boost when the doc contains
    ANY negative term. Covers positive/negative overlap (every positive
    match demoted), empty negative, and an all-demoting spec."""
    from dint_spark.bool_query import run_boosting_queries

    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    nb, k = 0.25, 6
    specs = [
        ([0, 3], [1]),        # plain demotion
        ([1, 2], []),         # no negative clause
        ([0], [0]),           # overlap: every match demoted, none dropped
        ([4, 4, 7], [2, 5]),  # duplicate positive term (qf = 2)
        ([38], [39]),         # tail terms
    ]
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[::2] = True
    dm = DocMask.from_mask(mask)
    for filt in (None, dm):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
            for r in run_boosting_queries(
                spark, sidx, specs, negative_boost=nb, k=k,
                doc_filter=filt).collect()
        }
        want = {}
        for qid, (pos, neg) in enumerate(specs):
            scores = _brute_bm25_scores(docs_pdf, vocab, pos)
            rows = []
            for d, s in scores.items():
                if filt is not None and not mask[d]:
                    continue
                m = nb if set(neg) & tm[d] else 1.0
                rows.append((-math.floor(s * m * 1e9), d))
            rows.sort()
            for i, (nsq, d) in enumerate(rows[:k], 1):
                want[(qid, i)] = (d, -nsq)
        assert got == want, filt is None


def test_run_terms_set_matches_brute(spark, sidx, docs_pdf):
    """terms_set == brute force: doc matches when it contains >=
    required(doc) of the spec's distinct terms, required from a per-doc
    field; required missing, < 1, or > matched count never matches;
    score = BM25 over the doc's matched terms. Thresholds cover 0,
    negative, oversize, and missing."""
    from dint_spark.bool_query import run_terms_set_queries
    from dint_spark.facets import _DV_MISSING

    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    # constructed per-doc thresholds: cycle 0..4, doc%13==2 -> missing,
    # doc%17==5 -> oversize (100)
    req = np.arange(sidx.num_docs, dtype=np.int64) % 5
    req[2::13] = _DV_MISSING
    req[5::17] = 100
    k = 6
    specs = [[0, 1, 2], [0, 3, 5, 7], [4], [38, 39]]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
        for r in run_terms_set_queries(
            spark, sidx, specs, req, k=k).collect()
    }
    want = {}
    for qid, terms in enumerate(specs):
        ts = sorted(set(terms))
        scores = _brute_bm25_scores(docs_pdf, vocab, ts)
        rows = []
        for d, s in scores.items():
            mc = len(set(ts) & tm[d])
            r = int(req[d])
            if r < 1 or mc < r:
                continue
            rows.append((-math.floor(s * 1e9), d))
        rows.sort()
        for i, (nsq, d) in enumerate(rows[:k], 1):
            want[(qid, i)] = (d, -nsq)
    assert got == want
    # the zero-threshold docs must be absent even when they match terms
    zero_docs = {d for d in range(sidx.num_docs)
                 if req[d] == 0 and set(specs[0]) & tm[d]}
    assert zero_docs and not {
        d for (_, _), (d, _) in got.items() if d in zero_docs}


def test_search_pinned_matches_brute(spark, sidx, docs_pdf):
    """pinned query == brute force: pins first in given order on the
    2^62 ladder (matching organically or not), organic BM25 fills the
    rest excluding pinned ids. Covers pin-dedup (a pin that also ranks
    organically), no pins, an unmatched pin, and more pins than k."""
    from dint_spark.search import PINNED_BASE, search_pinned

    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    k = 5
    # find a doc that ranks organically for term 0 (dedup case) and one
    # that does NOT match term 0 at all (unmatched pin case)
    s0 = _brute_bm25_scores(docs_pdf, vocab, [0])
    top0 = sorted(s0.items(), key=lambda t: (-t[1], t[0]))[0][0]
    nomatch = next(d for d in range(sidx.num_docs) if 0 not in tm[d])
    specs = [
        ([0, 3], [top0, nomatch]),    # dedup + unmatched pin
        ([1, 2], []),                 # no pins
        ([2], [7, 3, 11, 19, 23, 29]),  # more pins than k
    ]
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
        for r in search_pinned(spark, sidx, specs, k=k).collect()
    }
    want = {}
    for qid, (terms, pins) in enumerate(specs):
        out = [(d, PINNED_BASE - i) for i, d in enumerate(pins)]
        seen = set(pins)
        scores = _brute_bm25_scores(docs_pdf, vocab, terms)
        organic = sorted(((math.floor(s * 1e9), d)
                          for d, s in scores.items()),
                         key=lambda t: (-t[0], t[1]))
        for sq, d in organic:
            if len(out) >= k:
                break
            if d in seen:
                continue
            out.append((d, sq))
        for rank, (d, sq) in enumerate(out[:k], 1):
            want[(qid, rank)] = (d, sq)
    assert got == want

"""Compound bool DSL (must/should/must_not/minimum_should_match) ==
brute force over the token matrix + float64 BM25:

  - eligibility: all must terms, >= min_should should terms, no
    must_not term; ES min_should defaults (1 without must, 0 with);
  - score: BM25 sum over the must+should term multiset (must_not never
    scores), quantized floor(score*1e9), ties doc_id asc;
  - a term in both must and should satisfies both clauses;
  - contradictions (must & must_not overlap) return nothing;
  - DocMask composes; invalid specs raise.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dint_spark.bool_query import BoolSpec, run_bool_queries
from dint_spark.queries import DocMask

from test_facets_rerank import (_brute_bm25_scores, _tok_matrix,  # noqa: F401
                                _vocab_map, docs_pdf, sidx)

BOOL_SPECS = [
    BoolSpec(should=[0, 1, 2], min_should=2),
    BoolSpec(must=[0], should=[3, 5]),              # min_should -> 0
    BoolSpec(must=[1, 3], must_not=[2]),
    BoolSpec(must=[2], must_not=[2]),               # contradiction
    BoolSpec(must=[4], should=[4, 7], min_should=1),  # term in both
    BoolSpec(should=[30, 31, 32]),                  # min_should -> 1
    BoolSpec(must=[0, 0, 5]),                       # duplicate must term
]


def _brute_bool(docs_pdf, vocab, tm, spec, k, mask=None):
    scores = _brute_bm25_scores(
        docs_pdf, vocab, list(spec.must) + list(spec.should))
    must, should, neg = set(spec.must), set(spec.should), set(spec.must_not)
    rows = []
    for d, s in scores.items():
        ts = tm[d]
        if mask is not None and not mask[d]:
            continue
        if not (must <= ts):
            continue
        if len(should & ts) < spec.min_should:
            continue
        if neg & ts:
            continue
        rows.append((-math.floor(s * 1e9), d))
    rows.sort()
    return {(i + 1): (d, -nsq) for i, (nsq, d) in enumerate(rows[:k])}


def test_bool_dsl_matches_brute(spark, sidx, docs_pdf):
    vocab = _vocab_map(spark, sidx)
    tm = _tok_matrix(docs_pdf, vocab)
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[::3] = True
    dm = DocMask.from_mask(mask)
    k = 7
    for filt in (None, dm):
        got = {}
        for r in run_bool_queries(
                spark, sidx, BOOL_SPECS, k=k, doc_filter=filt).collect():
            got.setdefault(r["query_id"], {})[r["rank"]] = (
                r["doc_id"], r["score_q"])
        for qid, spec in enumerate(BOOL_SPECS):
            want = _brute_bool(docs_pdf, vocab, tm, spec, k,
                               mask=None if filt is None else mask)
            assert got.get(qid, {}) == want, (qid, filt is None)
    # the contradiction query must have returned nothing
    assert 3 not in got


def test_bool_dsl_es_min_should_defaults():
    assert BoolSpec(should=[1, 2]).min_should == 1
    assert BoolSpec(must=[0], should=[1, 2]).min_should == 0
    assert BoolSpec(must=[0]).min_should == 0


def test_bool_dsl_invalid_specs():
    with pytest.raises(ValueError, match="min_should"):
        BoolSpec(should=[1], min_should=2)
    with pytest.raises(ValueError, match="scoring clause"):
        BoolSpec(must_not=[1])


def test_bool_dsl_unknown_must_term_matches_nothing(spark, sidx):
    big = 10 ** 6  # far past the vocab
    out = run_bool_queries(
        spark, sidx, [BoolSpec(must=[0, big])], k=5).collect()
    assert out == []

"""Nested / parent-child pins: block-join rollup == brute force over the
token matrix + float64 BM25 (quantize child scores, group by parent,
score_mode sum|max|min|avg, min_children floor), has_parent mask
semantics, orphan children, and validation errors.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dint_spark.facets import _DV_MISSING
from dint_spark.nested import children_of_parents_mask, run_nested_queries
from dint_spark.queries import DocMask

from test_facets_rerank import (_brute_bm25_scores, _tok_matrix,  # noqa: F401
                                _vocab_map, docs_pdf, sidx)

N_DOCS = 300
SPECS = [[0], [1, 2], [0, 3, 5], [4], [38, 39]]


def _ords(n):
    """parent = doc // 3; every 17th child an orphan."""
    par = np.arange(n, dtype=np.int64) // 3
    par[4::17] = _DV_MISSING
    return par


def _brute_rollup(docs_pdf, vocab, terms, par, mode, minc, mask=None):
    scores = _brute_bm25_scores(docs_pdf, vocab, terms)
    groups: dict[int, list[int]] = {}
    for d, s in scores.items():
        if mask is not None and not mask[d]:
            continue
        if par[d] == _DV_MISSING:
            continue
        groups.setdefault(int(par[d]), []).append(math.floor(s * 1e9))
    rows = []
    for p, cq in groups.items():
        if len(cq) < minc:
            continue
        if mode == "sum":
            r = sum(cq)
        elif mode == "avg":
            r = sum(cq) // len(cq)
        elif mode == "max":
            r = max(cq)
        else:
            r = min(cq)
        rows.append((-r, p, len(cq)))
    rows.sort()
    return {(i + 1): (p, -nr, n) for i, (nr, p, n) in enumerate(rows)}


@pytest.mark.parametrize("mode,minc", [("sum", 1), ("max", 2),
                                       ("min", 1), ("avg", 3)])
def test_run_nested_matches_brute(spark, sidx, docs_pdf, mode, minc):
    vocab = _vocab_map(spark, sidx)
    par = _ords(sidx.num_docs)
    k = 6
    got = {
        (r["query_id"], r["rank"]): (r["parent_id"], r["score_q"],
                                     r["n_children"])
        for r in run_nested_queries(
            spark, sidx, SPECS, par, score_mode=mode,
            min_children=minc, k=k).collect()
    }
    want = {}
    for qid, terms in enumerate(SPECS):
        for rank, row in _brute_rollup(
                docs_pdf, vocab, terms, par, mode, minc).items():
            if rank <= k:
                want[(qid, rank)] = row
    assert got == want, (mode, minc)


def test_run_nested_composes_docmask(spark, sidx, docs_pdf):
    vocab = _vocab_map(spark, sidx)
    par = _ords(sidx.num_docs)
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[::2] = True
    dm = DocMask.from_mask(mask)
    k = 6
    got = {
        (r["query_id"], r["rank"]): (r["parent_id"], r["score_q"],
                                     r["n_children"])
        for r in run_nested_queries(
            spark, sidx, SPECS, par, score_mode="sum", k=k,
            doc_filter=dm).collect()
    }
    want = {}
    for qid, terms in enumerate(SPECS):
        for rank, row in _brute_rollup(
                docs_pdf, vocab, terms, par, "sum", 1, mask=mask).items():
            if rank <= k:
                want[(qid, rank)] = row
    assert got == want


def test_run_nested_validation(spark, sidx):
    par = _ords(sidx.num_docs)
    with pytest.raises(ValueError):
        run_nested_queries(spark, sidx, SPECS, par, score_mode="geo")
    with pytest.raises(ValueError):
        run_nested_queries(spark, sidx, SPECS, par, min_children=0)
    with pytest.raises(ValueError):
        run_nested_queries(spark, sidx, SPECS, par[:10])


def test_children_of_parents_mask():
    par = _ords(30)
    # callable predicate
    m = children_of_parents_mask(par, lambda p: p % 2 == 0).mask
    for d in range(30):
        want = par[d] != _DV_MISSING and par[d] % 2 == 0
        assert m[d] == want, d
    # array predicate (indexed by parent id)
    pred = np.zeros(10, dtype=bool)
    pred[3] = True
    m2 = children_of_parents_mask(par, pred).mask
    for d in range(30):
        want = par[d] != _DV_MISSING and par[d] == 3
        assert m2[d] == want, d
    with pytest.raises(ValueError):
        children_of_parents_mask(par, np.zeros(2, dtype=bool))

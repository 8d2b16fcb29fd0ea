"""Score explanation == brute force: for each quantized-BM25 top-k doc,
one row per matched query term carrying exact (tf, df) and the term's
quantized contribution; contributions sum back to the ranked score
within k*1 quantization ulps; unmatched terms emit no row; duplicate
query terms fold into one row with qf-weighted contribution; DocMask
composes.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from test_facets_rerank import docs_pdf, sidx, _vocab_map  # noqa: F401

from dint_spark.explain import run_queries_explain
from dint_spark.queries import DocMask

SPECS = [[0], [1, 2], [0, 3, 5], [4, 4, 7], [39]]


def _brute_explain(docs_pdf, vocab, terms, k, mask=None):
    inv = {tid: t for t, tid in vocab.items()}
    toks = [[w for w in t.lower().split() if w] for t in docs_pdf["text"]]
    n = len(toks)
    lens = np.array([len(t) for t in toks], dtype=np.float64)
    avg = lens.sum() / n
    tfs = [Counter(t) for t in toks]
    dfc = Counter()
    for c in tfs:
        dfc.update(set(c))
    q = Counter(terms)
    per_doc = {}
    for d, c in enumerate(tfs):
        if mask is not None and not mask[d]:
            continue
        rows, s = [], 0.0
        for tid, qf in sorted(q.items()):
            w = inv[tid]
            tf = c.get(w, 0)
            if not tf:
                continue
            idf = math.log((n - dfc[w] + 0.5) / (dfc[w] + 0.5))
            contrib = (float(qf) * max(1e-6, idf) * (1.0 + 1.2)
                       * (tf / (tf + 1.2 * (0.5 + 0.5 * (lens[d] / avg)))))
            rows.append((tid, tf, dfc[w], math.floor(contrib * 1e9)))
            s += contrib
        if rows:
            per_doc[d] = (math.floor(s * 1e9), rows)
    top = sorted(per_doc.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    out = {}
    for rank, (d, (sq, rows)) in enumerate(top, 1):
        for tid, tf, df, cq in rows:
            out[(rank, d, tid)] = (tf, df, cq)
    return out


def test_explain_matches_brute(spark, sidx, docs_pdf):
    vocab = _vocab_map(spark, sidx)
    mask = np.zeros(sidx.num_docs, dtype=bool)
    mask[::2] = True
    dm = DocMask.from_mask(mask)
    k = 5
    for filt in (None, dm):
        got = {}
        for r in run_queries_explain(
                spark, sidx, SPECS, k=k, doc_filter=filt).collect():
            got.setdefault(r["query_id"], {})[
                (r["rank"], r["doc_id"], r["term_id"])
            ] = (r["tf"], r["df"], r["contrib_q"])
        for qid, terms in enumerate(SPECS):
            want = _brute_explain(docs_pdf, vocab, terms, k,
                                  mask=None if filt is None else mask)
            assert got.get(qid, {}) == want, (qid, filt is None)


def test_explain_contribs_sum_to_ranked_score(spark, sidx):
    """Metamorphic vs the already-gated ranked surface: per (query, doc)
    the contribution sum equals the ranked score_q within |terms|
    quantization ulps (each term floors independently)."""
    import pyspark.sql.functions as F

    from dint_spark.paging import run_queries_after

    ranked = {(r["query_id"], r["doc_id"]): r["score_q"]
              for r in run_queries_after(spark, sidx, SPECS, None,
                                         k=5).collect()}
    sums = (run_queries_explain(spark, sidx, SPECS, k=5)
            .groupBy("query_id", "doc_id")
            .agg(F.sum("contrib_q").alias("s"),
                 F.count("*").alias("m")).collect())
    assert {(r["query_id"], r["doc_id"]) for r in sums} == set(ranked)
    for r in sums:
        sq = ranked[(r["query_id"], r["doc_id"])]
        assert abs(int(r["s"]) - sq) <= int(r["m"]), r

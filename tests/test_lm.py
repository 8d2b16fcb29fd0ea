"""Query-likelihood (Dirichlet) ranked retrieval (queries.run_queries_lm)
pinned against an independent driver-side brute force computed straight
from the tokenized pages — collection stats (cf_t, C), matched-only
scoring, the doc-length prior, quantized tie-breaks, and the liveDocs
(stale-stats) delete contract."""

import math
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from dint_spark.corpus import generate_pages
from dint_spark.index import IndexConfig, build_index, delete_docs
from dint_spark.queries import build_doc_filter, run_queries_lm
from dint_spark.tokenizer import TOKEN_SPLIT_RE

N_DOCS = 300
MU = 2000.0
_SPLIT = re.compile(TOKEN_SPLIT_RE)


@pytest.fixture(scope="module")
def lm_fixture(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lm")
    pages = generate_pages(spark, N_DOCS, seed=17)
    idx = build_index(spark, pages, str(base / "idx"),
                      IndexConfig(num_buckets=2, input_tag="lm"))
    # driver-side ground truth: tokens per ENGINE doc id (= url rank)
    rows = pages.select("url", "text").orderBy("url").collect()
    toks = [[w for w in _SPLIT.split(r["text"].lower()) if w] for r in rows]
    vocab = {r["term"]: int(r["term_id"])
             for r in idx.vocab().collect()}
    return idx, toks, vocab


def _brute_lm(toks, term_ids, inv_vocab, k=10, live=None):
    """Matched-only Dirichlet QL over the token lists, exact float64."""
    c_total = sum(len(t) for t in toks)
    tfs = [Counter(t) for t in toks]
    cf = Counter()
    for c in tfs:
        cf.update(c)
    q = Counter(term_ids)
    scores = {}
    for d, c in enumerate(tfs):
        if live is not None and not live[d]:
            continue
        s1, hit = 0.0, False
        for tid, qf in q.items():
            w = inv_vocab[tid]
            tf = c.get(w, 0)
            if tf:
                hit = True
                s1 += qf * math.log(1.0 + tf / (MU * (cf[w] / c_total)))
        if hit:
            ql = sum(q.values())
            scores[d] = s1 + ql * math.log(MU / (MU + len(toks[d])))
    ranked = sorted(scores.items(),
                    key=lambda kv: (-math.floor(kv[1] * 1e9), kv[0]))
    return [d for d, _ in ranked[:k]]


def _queries(vocab):
    terms = sorted(vocab.items(), key=lambda kv: kv[1])
    t = [tid for _, tid in terms]
    return [
        [t[0]],
        [t[1], t[4]],
        [t[2], t[2], t[9]],          # duplicate term -> qf = 2
        [t[0], t[30], t[min(len(t) - 1, 180)]],
        [t[min(len(t) - 1, 200)]],
    ]


def _engine_topk(df):
    pdf = df.toPandas()
    pdf["score_q"] = np.floor(pdf["score"].to_numpy() * 1e9).astype(np.int64)
    out = {}
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["score_q", "doc_id"],
                          ascending=[False, True])
        out[int(qid)] = g["doc_id"].tolist()[:10]
    return out


def test_lm_matches_brute_force(lm_fixture):
    idx, toks, vocab = lm_fixture
    inv = {tid: w for w, tid in vocab.items()}
    qs = _queries(vocab)
    got = _engine_topk(run_queries_lm(idx.spark, idx, qs, mu=MU, k=10))
    for qid, terms in enumerate(qs):
        assert got[qid] == _brute_lm(toks, terms, inv), f"query {qid}"


def test_lm_scores_are_finite_and_ordered(lm_fixture):
    idx, _, vocab = lm_fixture
    qs = _queries(vocab)
    pdf = run_queries_lm(idx.spark, idx, qs, mu=MU, k=10).toPandas()
    assert np.isfinite(pdf["score"]).all()
    for _, g in pdf.groupby("query_id"):
        s = g.sort_values("rank")["score"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()


def test_lm_with_filter_and_deletes(spark, tmp_path, lm_fixture):
    """Stale-stats liveDocs contract: cf/C keep their build values, the
    candidate set masks to live AND allowed."""
    _, toks, vocab = lm_fixture
    pages = generate_pages(spark, N_DOCS, seed=17)
    idx = build_index(spark, pages, str(tmp_path / "idx"),
                      IndexConfig(num_buckets=2, input_tag="lmdel"))
    doomed = [0, 3, 7, 150]
    delete_docs(spark, idx, doomed)
    allowed = spark.range(0, N_DOCS, 2).select(F.col("id").alias("doc_id"))
    mask = build_doc_filter(spark, allowed, idx.num_docs)
    inv = {tid: w for w, tid in vocab.items()}
    qs = _queries(vocab)
    live = np.zeros(N_DOCS, dtype=bool)
    live[::2] = True
    live[doomed] = False
    got = _engine_topk(run_queries_lm(spark, idx, qs, mu=MU, k=10,
                                      doc_filter=mask))
    for qid, terms in enumerate(qs):
        assert got[qid] == _brute_lm(toks, terms, inv, live=live), \
            f"query {qid}"

"""multi_match over per-field indexes == brute force:

  - per-field BM25 with that field's own df/length/avg-len statistics
    (title = first 8 tokens, body = the rest — disjoint stats);
  - most_fields = boosted sum, best_fields = max + tie_breaker * rest;
  - OR across fields (a title-only hit still returns);
  - per-field OOV drop (a token can exist in one field's vocab only);
  - quantized floor(score*1e9) ranking, ties doc_id asc;
  - DocMask composes; num_docs mismatch across indexes rejected.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from test_facets_rerank import docs_pdf  # noqa: F401 (fixtures)

from dint_spark.multifield import run_multi_match
from dint_spark.queries import DocMask

TITLE_N = 8
QUERIES = ["w0 w3", "w1 w2 w5", "w4 w4 w9", "w30 w39", "w7 zzznotaword"]
BOOSTS = {"title": 2.0, "body": 1.0}


def _field_toks(docs_pdf):
    toks = [[w for w in t.lower().split() if w] for t in docs_pdf["text"]]
    return ([t[:TITLE_N] for t in toks], [t[TITLE_N:] for t in toks])


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory, docs_pdf):
    from dint_spark.corpus import pages_from_documents
    from dint_spark.index import IndexConfig, build_index

    title, body = _field_toks(docs_pdf)
    out = {}
    for name, toks in (("title", title), ("body", body)):
        docs = spark.createDataFrame(
            [(d, " ".join(t), "en") for d, t in enumerate(toks)],
            "doc_id long, text string, lang string")
        d = str(tmp_path_factory.mktemp("idx") / name)
        out[name] = build_index(
            spark, pages_from_documents(docs), d,
            IndexConfig(num_buckets=2, input_tag=f"mf-{name}"))
    return out


def _brute_field_bm25(field_toks, qtoks):
    n = len(field_toks)
    lens = np.array([len(t) for t in field_toks], dtype=np.float64)
    avg = lens.sum() / n
    tfs = [Counter(t) for t in field_toks]
    df = Counter()
    for c in tfs:
        df.update(set(c))
    q = Counter(qtoks)
    scores = {}
    for d, c in enumerate(tfs):
        s, hit = 0.0, False
        for w, qf in sorted(q.items()):
            tf = c.get(w, 0)
            if not tf or not df[w]:
                continue
            hit = True
            idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5))
            qw = float(qf) * max(1e-6, idf) * (1.0 + 1.2)
            s += qw * (tf / (tf + 1.2 * (0.5 + 0.5 * (lens[d] / avg))))
        if hit:
            scores[d] = s
    return scores


def _brute_multi(docs_pdf, queries, mode, tb, k, mask=None):
    title, body = _field_toks(docs_pdf)
    out = {}
    for qid, q in enumerate(queries):
        qtoks = [w for w in q.lower().split() if w]
        st = _brute_field_bm25(title, qtoks)
        sb = _brute_field_bm25(body, qtoks)
        rows = []
        for d in set(st) | set(sb):
            if mask is not None and not mask[d]:
                continue
            a = BOOSTS["title"] * st.get(d, 0.0)
            b = BOOSTS["body"] * sb.get(d, 0.0)
            if mode == "most_fields":
                s = a + b
            else:
                best = max(a, b)
                s = best + tb * (a + b - best)
            rows.append((-math.floor(s * 1e9), d))
        rows.sort()
        for i, (nsq, d) in enumerate(rows[:k]):
            out[(qid, i + 1)] = (d, -nsq)
    return out


@pytest.mark.parametrize("mode,tb", [("best_fields", 0.25),
                                     ("most_fields", 0.0)])
def test_multi_match_matches_brute(spark, fidx, docs_pdf, mode, tb):
    mask = np.zeros(next(iter(fidx.values())).num_docs, dtype=bool)
    mask[::2] = True
    dm = DocMask.from_mask(mask)
    k = 6
    for filt in (None, dm):
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score_q"])
            for r in run_multi_match(
                spark, fidx, QUERIES, boosts=BOOSTS, mode=mode,
                tie_breaker=tb, k=k, doc_filter=filt).collect()
        }
        want = _brute_multi(docs_pdf, QUERIES, mode, tb, k,
                            mask=None if filt is None else mask)
        assert got == want, (mode, filt is None)


def test_multi_match_field_only_hits(spark, fidx, docs_pdf):
    """A doc whose only hit is in the title still returns (OR across
    fields): find a word that appears in SOME doc's title toks but not
    its body toks, and check that doc is scored."""
    title, body = _field_toks(docs_pdf)
    probe = None
    for d in range(len(title)):
        only = set(title[d]) - set(body[d])
        if only:
            probe = (d, sorted(only)[0])
            break
    assert probe is not None
    d, w = probe
    got = {r["doc_id"] for r in run_multi_match(
        spark, fidx, [w], k=len(title)).collect()}
    assert d in got


def test_multi_match_rejects_mismatched_indexes(spark, fidx):
    class _Shrunk:
        num_docs = 1

    bad = dict(fidx)
    bad["other"] = _Shrunk()
    with pytest.raises(ValueError, match="num_docs"):
        run_multi_match(spark, bad, ["w0"])


def test_multi_match_all_oov(spark, fidx):
    assert run_multi_match(spark, fidx, ["qqq zzz"]).collect() == []

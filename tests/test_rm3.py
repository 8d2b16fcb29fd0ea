"""RM3 pseudo-relevance feedback (search.rm3_expand / rm3_search) and the
weighted-query channel (run_queries weighted=True), pinned against an
independent driver-side brute force and by metamorphic laws."""

import math
import re
from collections import Counter

import numpy as np
import pytest

from dint_spark.corpus import generate_pages
from dint_spark.index import IndexConfig, build_index
from dint_spark.queries import run_queries
from dint_spark.search import rm3_expand, rm3_search
from dint_spark.tokenizer import TOKEN_SPLIT_RE

N_DOCS = 300
FB_DOCS, FB_TERMS, A = 5, 8, 0.5
_SPLIT = re.compile(TOKEN_SPLIT_RE)


@pytest.fixture(scope="module")
def rm3_fixture(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("rm3")
    pages = generate_pages(spark, N_DOCS, seed=29)
    idx = build_index(spark, pages, str(base / "idx"),
                      IndexConfig(num_buckets=2, input_tag="rm3"))
    rows = pages.select("url", "text").orderBy("url").collect()
    toks = [[w for w in _SPLIT.split(r["text"].lower()) if w] for r in rows]
    vocab = {r["term"]: int(r["term_id"]) for r in idx.vocab().collect()}
    docs_df = pages.sparkSession.createDataFrame(
        [(d, " ".join(t)) for d, t in enumerate(toks)], "doc_id long, text string")
    return idx, toks, vocab, docs_df


def _brute_bm25(toks, term_ids, inv_vocab, weights=None):
    """Float64 BM25 (the reference variant) over token lists; weights maps
    term_id -> float query weight (defaults to qf counts)."""
    n = len(toks)
    lens = np.array([len(t) for t in toks], dtype=np.float64)
    avg = lens.sum() / n
    tfs = [Counter(t) for t in toks]
    df = Counter()
    for c in tfs:
        df.update(set(c))
    q = Counter(term_ids) if weights is None else weights
    scores = {}
    for d, c in enumerate(tfs):
        s, hit = 0.0, False
        for tid, wq in sorted(q.items()):
            w = inv_vocab[tid]
            tf = c.get(w, 0)
            if not tf:
                continue
            hit = True
            idf = math.log((n - df[w] + 0.5) / (df[w] + 0.5))
            qw = float(wq) * max(1e-6, idf) * (1.0 + 1.2)
            s += qw * (tf / (tf + 1.2 * (0.5 + 0.5 * (lens[d] / avg))))
        if hit:
            scores[d] = s
    return scores


def _topk_ids(scores, k=10):
    return [d for d, _ in sorted(
        scores.items(), key=lambda kv: (-math.floor(kv[1] * 1e9), kv[0]))[:k]]


def _brute_rm3(toks, term_ids, inv_vocab, k=10):
    base = _brute_bm25(toks, term_ids, inv_vocab)
    fb = _topk_ids(base, FB_DOCS)
    n_fb = len(fb)
    p = Counter()
    for d in fb:
        c = Counter(toks[d])
        ln = len(toks[d])
        for w, tf in c.items():
            p[w] += tf / ln
    pq = {w: math.floor(s / n_fb * 1e12) for w, s in p.items()}
    top = sorted(pq.items(), key=lambda kv: (-kv[1], kv[0]))[:FB_TERMS]
    vocab = {w: t for t, w in inv_vocab.items()}
    q = Counter(term_ids)
    ql = sum(q.values())
    wts = {t: A * (c / ql) for t, c in q.items()}
    for w, v in top:
        t = vocab[w]
        wts[t] = wts.get(t, 0.0) + (1.0 - A) * (v / 1e12)
    return _topk_ids(_brute_bm25(toks, term_ids, inv_vocab, weights=wts), k)


def _queries(vocab):
    t = [tid for _, tid in sorted(vocab.items(), key=lambda kv: kv[1])]
    return [[t[0]], [t[1], t[5]], [t[2], t[2], t[8]],
            [t[3], t[40], t[min(len(t) - 1, 150)]]]


def _engine_ids(df, k=10):
    pdf = df.toPandas()
    pdf["score_q"] = np.floor(pdf["score"].to_numpy() * 1e9).astype(np.int64)
    out = {}
    for qid, g in pdf.groupby("query_id"):
        g = g.sort_values(["score_q", "doc_id"], ascending=[False, True])
        out[int(qid)] = g["doc_id"].tolist()[:k]
    return out


def test_weighted_integer_weights_match_qf(rm3_fixture):
    """weighted=True with integer-valued float weights is BIT-IDENTICAL to
    the plain qf path (DT(2.0) == DT(2))."""
    idx, _, vocab, _ = rm3_fixture
    qs = _queries(vocab)
    wspecs = [sorted(Counter(q).items()) for q in qs]
    wspecs = [[(t, float(c)) for t, c in s] for s in wspecs]
    for algo in ("ranked_or", "block_max_wand", "maxscore"):
        r1 = run_queries(idx.spark, idx, qs, algo=algo, k=10,
                         dtype="float64").toPandas()
        r2 = run_queries(idx.spark, idx, wspecs, algo=algo, k=10,
                         dtype="float64", weighted=True).toPandas()
        key = ["query_id", "rank"]
        assert r1.sort_values(key).reset_index(drop=True).equals(
            r2.sort_values(key).reset_index(drop=True))


def test_rm3_matches_brute_force(rm3_fixture):
    idx, toks, vocab, docs_df = rm3_fixture
    inv = {tid: w for w, tid in vocab.items()}
    qs = _queries(vocab)
    got = _engine_ids(rm3_search(
        idx.spark, idx, qs, docs_df, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
        orig_weight=A, k=20, dtype="float64"))
    for qid, terms in enumerate(qs):
        assert got[qid] == _brute_rm3(toks, terms, inv), f"query {qid}"


def test_rm3_pure_original_weight_preserves_ranking(rm3_fixture):
    """orig_weight=1.0 scales every query weight by 1/|q| — the doc-id
    ranking must equal plain BM25's."""
    idx, _, vocab, docs_df = rm3_fixture
    qs = _queries(vocab)
    plain = _engine_ids(run_queries(idx.spark, idx, qs, k=20,
                                    dtype="float64"))
    pure = _engine_ids(rm3_search(idx.spark, idx, qs, docs_df,
                                  fb_docs=FB_DOCS, fb_terms=FB_TERMS,
                                  orig_weight=1.0, k=20, dtype="float64"))
    assert plain == pure


def test_synonyms_match_brute_force(rm3_fixture):
    """search_synonyms == hand-computed weighted BM25 (1.0 per token,
    0.5 per synonym occurrence, OOV dropped after expansion)."""
    from dint_spark.search import search_synonyms

    idx, toks, vocab, _ = rm3_fixture
    inv = {tid: w for w, tid in vocab.items()}
    words = sorted(vocab)[:8]
    synmap = {words[0]: [words[1], words[2]],
              words[3]: [words[4]],
              words[5]: ["zzznotavocabword"]}
    queries = [f"{words[0]} {words[3]}",      # two expansions fire
               f"{words[0]} {words[0]}",      # repeats: 2.0 + 2x0.5
               f"{words[5]}",                 # OOV synonym drops
               words[6],                      # no synonyms
               "zzzmissing"]                  # all-OOV -> no rows
    got = _engine_ids(search_synonyms(
        idx.spark, idx, queries, synmap, syn_weight=0.5, k=20,
        dtype="float64"))
    for qid, q in enumerate(queries):
        w: dict[int, float] = {}
        for t in q.split():
            if t in vocab:
                w[vocab[t]] = w.get(vocab[t], 0.0) + 1.0
            for s in synmap.get(t, ()):
                if s in vocab:
                    w[vocab[s]] = w.get(vocab[s], 0.0) + 0.5
        want = (_topk_ids(_brute_bm25(toks, [], inv, weights=w), 10)
                if w else [])
        assert got.get(qid, []) == want, f"query {qid}"


def test_rm3_expansion_adds_terms(rm3_fixture):
    idx, _, vocab, docs_df = rm3_fixture
    qs = _queries(vocab)
    specs = rm3_expand(idx.spark, idx, qs, docs_df, fb_docs=FB_DOCS,
                       fb_terms=FB_TERMS, orig_weight=A, dtype="float64")
    for q, spec in zip(qs, specs):
        tids = {t for t, _ in spec}
        assert set(q) <= tids          # originals always kept
        assert len(tids) > len(set(q))  # feedback added something
        assert all(w > 0 for _, w in spec)

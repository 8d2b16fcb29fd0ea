"""Match-set term mining: significant_terms + more_like_this.

Contracts under test:
  - significant_terms == a pandas brute force that recomputes match sets,
    per-matched-doc DISTINCT-term foreground dfs, exact-integer positive-
    significance cut, quantized JLH, query-term exclusion, and ties;
  - the max_fg_docs sampling cap == brute force over the lowest doc_ids;
  - mlt_terms == a pandas brute force of the Lucene MLT tf-idf selection
    under the frequency gates and quantization;
  - more_like_this == the engine's own (gate-green) weighted-query path
    run on the brute-force-selected terms, with the source doc excluded
    and the quantized re-rank contract applied (metamorphic composition);
  - a source doc whose every term is gated away yields no rows.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from dint_spark.queries import run_queries

N_DOCS = 280


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.default_rng(91)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(N_DOCS):
        n = int(rng.integers(5, 60))
        toks = rng.choice(words, size=n,
                          p=np.arange(40, 0, -1) / np.arange(40, 0, -1).sum())
        rows.append((d, " ".join(toks)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory, docs_pdf):
    from dint_spark.corpus import pages_from_documents
    from dint_spark.index import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("idx") / "mining")
    docs = spark.createDataFrame(docs_pdf.assign(lang="en"))
    pages = pages_from_documents(docs)
    return build_index(spark, pages, out,
                       IndexConfig(num_buckets=2, input_tag="mining-test"))


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


@pytest.fixture(scope="module")
def vocab_pdf(spark, sidx):
    return (spark.read.parquet(f"{sidx.dir}/vocab.parquet")
            .toPandas().set_index("term"))


def _brute_sig(docs_pdf, vocab, specs, n, k, max_fg=None):
    """Independent JLH recompute (df from raw token sets, not the index)."""
    tsets = [set(_tok(t)) for t in docs_pdf["text"]]
    df_ct: dict = {}
    for s in tsets:
        for t in s:
            df_ct[t] = df_ct.get(t, 0) + 1
    tid_of = vocab["term_id"].to_dict()
    id_terms = {int(v): t for t, v in tid_of.items()}
    want = []
    for qid, terms in enumerate(specs):
        need = {id_terms[t] for t in terms}
        matched = [d for d, s in enumerate(tsets) if need <= s]
        if max_fg is not None:
            matched = sorted(matched)[:max_fg]
        n_fg = len(matched)
        if n_fg == 0:
            continue
        fg_ct: dict = {}
        for d in matched:
            for t in tsets[d]:
                fg_ct[t] = fg_ct.get(t, 0) + 1
        rows = []
        for t, fg in fg_ct.items():
            tid = int(tid_of[t])
            if tid in set(terms):
                continue
            df = df_ct[t]
            if fg * n <= df * n_fg:  # exact positive-significance cut
                continue
            fr, br = fg / n_fg, df / n
            jlh_q = int(math.floor((fr - br) * (fr / br) * 1e6))
            rows.append((jlh_q, tid, t, fg, df))
        rows.sort(key=lambda x: (-x[0], x[1]))
        for rank, (jq, tid, t, fg, df) in enumerate(rows[:k], 1):
            want.append((qid, rank, tid, t, jq, fg, df))
    return sorted(want)


def test_significant_terms_matches_brute(spark, sidx, docs_pdf, vocab_pdf):
    from dint_spark.mining import significant_terms

    specs = [[0], [1, 3], [2, 5], [30]]
    k = 8
    docs = spark.createDataFrame(docs_pdf)
    got = significant_terms(spark, sidx, specs, docs, k=k).collect()
    got_t = sorted((r["query_id"], r["rank"], r["term_id"], r["term"],
                    r["jlh_q"], r["fg"], r["df"]) for r in got)
    assert got_t == _brute_sig(docs_pdf, vocab_pdf, specs,
                               sidx.num_docs, k)
    assert got_t  # non-degenerate workload


def test_significant_terms_fg_cap(spark, sidx, docs_pdf, vocab_pdf):
    from dint_spark.mining import significant_terms

    specs = [[0], [1]]
    docs = spark.createDataFrame(docs_pdf)
    got = significant_terms(spark, sidx, specs, docs, k=5,
                            max_fg_docs=20).collect()
    got_t = sorted((r["query_id"], r["rank"], r["term_id"], r["term"],
                    r["jlh_q"], r["fg"], r["df"]) for r in got)
    assert got_t == _brute_sig(docs_pdf, vocab_pdf, specs,
                               sidx.num_docs, 5, max_fg=20)


def _brute_mlt_terms(docs_pdf, vocab, doc_ids, n, max_terms, min_tf,
                     min_df, max_df_frac):
    tid_of = vocab["term_id"].to_dict()
    df_of = vocab["df"].to_dict()
    out: dict = {}
    for qid, d in enumerate(doc_ids):
        toks = _tok(docs_pdf["text"][d])
        tf_ct: dict = {}
        for t in toks:
            tf_ct[t] = tf_ct.get(t, 0) + 1
        rows = []
        for t, tf in tf_ct.items():
            df = int(df_of[t])
            if tf < min_tf or df < min_df or df > int(max_df_frac * n):
                continue
            mlt_q = int(math.floor(tf * (math.log(n / (df + 1)) + 1.0)
                                   * 1e9))
            rows.append((mlt_q, t, int(tid_of[t]), tf))
        rows.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = [(tid, t, tf, mq) for mq, t, tid, tf in
                    rows[:max_terms]]
    return out


def test_mlt_terms_matches_brute(spark, sidx, docs_pdf, vocab_pdf):
    from dint_spark.mining import mlt_terms

    doc_ids = [0, 7, 42, 123]
    args = dict(max_terms=6, min_tf=1, min_df=1, max_df_frac=0.9)
    docs = spark.createDataFrame(docs_pdf)
    got = mlt_terms(spark, sidx, doc_ids, docs, **args).collect()
    want = _brute_mlt_terms(docs_pdf, vocab_pdf, doc_ids, sidx.num_docs,
                            args["max_terms"], args["min_tf"],
                            args["min_df"], args["max_df_frac"])
    got_m: dict = {}
    for r in got:
        got_m.setdefault(r["query_id"], []).append(
            (r["term_id"], r["term"], r["tf"], r["mlt_q"]))
    assert {q: sorted(v) for q, v in got_m.items()} \
        == {q: sorted(v) for q, v in want.items() if v}


def test_more_like_this_composition(spark, sidx, docs_pdf, vocab_pdf):
    """more_like_this == run_queries(weighted) on the brute-selected
    terms, self-excluded, quantized-reranked (metamorphic: the weighted
    channel itself is pinned elsewhere)."""
    from dint_spark.mining import more_like_this

    doc_ids = [0, 42, 200]
    k = 5
    args = dict(max_terms=6, min_tf=1, min_df=1, max_df_frac=0.9)
    docs = spark.createDataFrame(docs_pdf)
    got = more_like_this(spark, sidx, doc_ids, docs, k=k, **args).collect()

    sel = _brute_mlt_terms(docs_pdf, vocab_pdf, doc_ids, sidx.num_docs,
                           args["max_terms"], args["min_tf"],
                           args["min_df"], args["max_df_frac"])
    specs = [sorted((tid, float(tf)) for tid, _, tf, _ in sel[q])
             for q in range(len(doc_ids))]
    raw = run_queries(spark, sidx, specs, algo="block_max_wand",
                      k=2 * (k + 1), dtype="float64",
                      weighted=True).collect()
    by_q: dict = {}
    for r in raw:
        by_q.setdefault(r["query_id"], []).append(
            (int(np.floor(r["score"] * 1e9)), r["doc_id"]))
    want = []
    for qid, src in enumerate(doc_ids):
        rows = sorted(by_q.get(qid, []), key=lambda x: (-x[0], x[1]))
        rows = [(s, d) for s, d in rows if d != src]
        for rank, (s, d) in enumerate(rows[:k], 1):
            want.append((qid, rank, d, s))
    got_t = sorted((r["query_id"], r["rank"], r["doc_id"], r["score_q"])
                   for r in got)
    assert got_t == sorted(want)
    assert len(got_t) == len(doc_ids) * k


def test_more_like_this_all_gated(spark, sidx, docs_pdf):
    """min_tf too high for any term -> empty specs -> no rows."""
    from dint_spark.mining import more_like_this

    docs = spark.createDataFrame(docs_pdf)
    got = more_like_this(spark, sidx, [0, 1], docs, k=5,
                         min_tf=10_000).collect()
    assert got == []

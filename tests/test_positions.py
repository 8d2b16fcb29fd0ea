"""Positional index: position-stream codec laws, end-to-end positional
build, and phrase retrieval vs a brute-force token-window oracle.

The reference has no positional index (its data model is docs+freqs only,
include/ds2i/binary_freq_collection.hpp); positions are a builder-brief
extension — a fulltext engine's phrase/proximity layer — reusing the DINT
block machinery as a third learned stream (SURVEY §2 extension)."""

import shutil

import numpy as np
import pytest

from dint_spark.corpus import generate_pages
from dint_spark.dint.codec import (
    decode_value_stream,
    encode_value_streams_batch,
    gaps_to_positions,
    positions_to_gaps,
)
from dint_spark.dint.dictionary import DintDictionary
from dint_spark.index import IndexConfig, build_index, load_index
from dint_spark.queries import phrase_match_kernel, run_phrase_queries
from dint_spark.tokenizer import assign_doc_ids, tokenize

IDX_DIR = "/tmp/dint_spark_test_posidx"
N_DOCS = 400


# ---------------------------------------------------------------------------
# codec-level laws (no Spark)
# ---------------------------------------------------------------------------

def _random_streams(rng, trials=40):
    streams, metas = [], []
    for _ in range(trials):
        ndocs = int(rng.integers(1, 40))
        freqs, parts = [], []
        for _ in range(ndocs):
            t = int(rng.integers(1, 30))
            doclen = t + int(rng.integers(0, 500))
            parts.append(np.sort(rng.choice(doclen, size=t, replace=False)))
            freqs.append(t)
        pos_flat = np.concatenate(parts)
        freqs = np.asarray(freqs)
        streams.append(positions_to_gaps(pos_flat, freqs))
        metas.append((pos_flat, freqs))
    # multi-block stream, exact-256 stream, exceptions > 65535
    big = np.sort(rng.choice(300000, size=3000, replace=False))
    streams.append(positions_to_gaps(big, np.array([3000])))
    metas.append((big, np.array([3000])))
    ex = np.arange(0, 512, 2)
    streams.append(positions_to_gaps(ex, np.array([256])))
    metas.append((ex, np.array([256])))
    far = np.array([0, 100000, 200001])
    streams.append(positions_to_gaps(far, np.array([3])))
    metas.append((far, np.array([3])))
    return streams, metas


def test_position_gap_transform_roundtrip():
    rng = np.random.default_rng(7)
    streams, metas = _random_streams(rng)
    for vals, (pos_flat, freqs) in zip(streams, metas):
        assert np.array_equal(gaps_to_positions(vals, freqs), pos_flat)


@pytest.mark.parametrize("optimal", [True, False])
def test_value_stream_codec_roundtrip(optimal):
    rng = np.random.default_rng(13)
    streams, metas = _random_streams(rng)
    # empty dictionary forces the all-exception path; a learned-ish dict
    # exercises pattern codewords
    learned = DintDictionary.build(
        [np.asarray([1] * s, "<u4").tobytes() for s in (16, 8, 4, 2, 1)]
        + [np.asarray([2, 5] * (s // 2), "<u4").tobytes() for s in (4, 2)]
    )
    for dct in (DintDictionary.build([]), learned):
        enc = encode_value_streams_batch(streams, dct, optimal=optimal)
        for (payload, endp), vals, (pos_flat, freqs) in zip(
                enc, streams, metas):
            dec = decode_value_stream(payload, len(vals), endp, dct)
            assert np.array_equal(dec, vals)
            assert np.array_equal(gaps_to_positions(dec, freqs), pos_flat)


def test_phrase_kernel_counts_overlaps():
    # doc 0 tokens: a a a b -> phrase "a a" occurs at 0 and 1 (overlap)
    def keys(doc, positions):
        return (np.asarray([doc] * len(positions), np.uint64) << np.uint64(32)
                ) | np.asarray(positions, np.uint64)

    a = keys(0, [0, 1, 2])
    b = keys(0, [3])
    docs, tfs = phrase_match_kernel([a, a])
    assert docs.tolist() == [0] and tfs.tolist() == [2]
    docs, tfs = phrase_match_kernel([a, b])  # "a b" at start 2
    assert docs.tolist() == [0] and tfs.tolist() == [1]
    docs, tfs = phrase_match_kernel([b, a])  # "b a" never
    assert len(docs) == 0


# ---------------------------------------------------------------------------
# end-to-end positional build + phrase retrieval
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pos_index(spark):
    shutil.rmtree(IDX_DIR, ignore_errors=True)
    pages = generate_pages(spark, N_DOCS, seed=42)
    return build_index(
        spark, pages, IDX_DIR,
        IndexConfig(num_buckets=2, input_tag="pos400", positions=True))


@pytest.fixture(scope="module")
def corpus_tokens(spark):
    pages = generate_pages(spark, N_DOCS, seed=42)
    rows = (tokenize(assign_doc_ids(pages.select("url", "text")))
            .select("doc_id", "tokens").collect())
    return {r.doc_id: r.tokens for r in rows}


def test_positions_match_raw_tokens(spark, pos_index, corpus_tokens):
    from dint_spark.dint.codec import decode_list_bulk

    assert pos_index.has_positions
    seg = pos_index.segments
    rows = seg.where("n >= 50").limit(5).collect()
    vocab = {r.term_id: r.term for r in pos_index.vocab().collect()}
    assert rows
    for row in rows:
        docs, freqs = decode_list_bulk(
            row.payload, row.n, np.asarray(row.block_maxs, np.int64),
            np.asarray(row.endpoints, np.int64),
            np.asarray(row.freq_offsets, np.int64),
            pos_index.docs_dict, pos_index.freqs_dict)
        vals = decode_value_stream(
            row.pos_payload, int(freqs.sum()),
            np.asarray(row.pos_endpoints, np.int64), pos_index.pos_dict)
        pos = gaps_to_positions(vals, freqs)
        cuts = np.concatenate([[0], np.cumsum(freqs)])
        term = vocab[row.term_id]
        for i, d in enumerate(docs[:10]):
            expect = [j for j, t in enumerate(corpus_tokens[int(d)])
                      if t == term]
            assert pos[cuts[i]:cuts[i + 1]].tolist() == expect


def test_phrase_queries_match_bruteforce(spark, pos_index, corpus_tokens):
    vocab = {r.term_id: r.term for r in pos_index.vocab().collect()}
    inv = {v: k for k, v in vocab.items()}
    rng = np.random.default_rng(11)
    phrases = []
    for _ in range(10):
        d = corpus_tokens[int(rng.integers(0, N_DOCS))]
        i = int(rng.integers(0, max(1, len(d) - 3)))
        ln = int(rng.integers(2, 4))
        phrases.append([inv[t] for t in d[i:i + ln]])
    phrases += [[0, 0],            # repeated head term (overlap counting)
                [5, 99999999],     # term absent from the index
                [3]]               # single-term phrase (== its tf rows)
    res = run_phrase_queries(spark, pos_index, phrases).toPandas()

    for qid, ph in enumerate(phrases):
        terms = [vocab.get(t) for t in ph]
        expect = {}
        if not any(t is None for t in terms):
            for did, tl in corpus_tokens.items():
                c = sum(1 for j in range(len(tl) - len(terms) + 1)
                        if tl[j:j + len(terms)] == terms)
                if c:
                    expect[did] = c
        got = {int(r.doc_id): int(r.phrase_tf)
               for r in res[res.query_id == qid].itertuples()}
        assert got == expect, (qid, ph)


def test_proximity_queries_match_bruteforce(spark, pos_index, corpus_tokens):
    from dint_spark.queries import run_proximity_queries

    vocab = {r.term_id: r.term for r in pos_index.vocab().collect()}
    pairs = [[0, 1], [1, 0], [2, 5], [0, 0], [7, 99999999], [3, 4]]
    W = 5
    res = run_proximity_queries(spark, pos_index, pairs, window=W).toPandas()
    for qid, (ta, tb) in enumerate(pairs):
        a, b = vocab.get(ta), vocab.get(tb)
        expect = {}
        if a is not None and b is not None:
            for did, tl in corpus_tokens.items():
                c = sum(1 for i, t in enumerate(tl) if t == a
                        for j in range(i + 1, min(i + W + 1, len(tl)))
                        if tl[j] == b)
                if c:
                    expect[did] = c
        got = {int(r.doc_id): int(r.phrase_tf)
               for r in res[res.query_id == qid].itertuples()}
        assert got == expect, (qid, ta, tb)


def test_phrase_requires_positions(spark, tmp_path):
    pages = generate_pages(spark, 50, seed=42)
    idx = build_index(spark, pages, str(tmp_path / "nopos"),
                      IndexConfig(num_buckets=1, input_tag="nopos"))
    with pytest.raises(ValueError, match="positions"):
        run_phrase_queries(spark, idx, [[0, 1]])


def test_config_hash_back_compat():
    # positions=False must hash identically to a config that predates the
    # knob (resume compatibility for existing indexes)...
    base = IndexConfig()
    d_off = base.config_hash()
    d_on = IndexConfig(positions=True).config_hash()
    assert d_off != d_on
    # ...and a positional index rejects resume under a non-positional config
    # via the ordinary config-hash gate (covered by test_pipeline's
    # config-mismatch test pattern).


def test_bm25_unaffected_by_positions(spark, pos_index):
    """Ranked retrieval over a positional index returns the same top-k as
    over the equivalent non-positional index (positions are additive)."""
    from dint_spark.queries import run_queries

    out = str("/tmp/dint_spark_test_nopos400")
    shutil.rmtree(out, ignore_errors=True)
    pages = generate_pages(spark, N_DOCS, seed=42)
    plain = build_index(spark, pages, out,
                        IndexConfig(num_buckets=2, input_tag="pos400"))
    qs = [[0, 3, 7], [1], [2, 5, 9, 11], [4, 4, 8]]
    a = run_queries(spark, pos_index, qs, algo="block_max_wand", k=10
                    ).toPandas().sort_values(["query_id", "rank"])
    b = run_queries(spark, plain, qs, algo="block_max_wand", k=10
                    ).toPandas().sort_values(["query_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_kwic_snippets_match_bruteforce(spark, pos_index, corpus_tokens):
    from dint_spark.corpus import generate_pages
    from dint_spark.queries import run_kwic_queries
    from dint_spark.tokenizer import assign_doc_ids

    vocab = {r.term_id: r.term for r in pos_index.vocab().collect()}
    docs = assign_doc_ids(
        generate_pages(spark, N_DOCS, seed=42).select("url", "text"))
    terms = [0, 4, 11, 99999999]  # head, mid terms + absent term
    W = 3
    res = run_kwic_queries(spark, pos_index, docs, terms,
                           width=W).toPandas()
    for qid, tid in enumerate(terms):
        term = vocab.get(tid)
        expect = {}
        if term is not None:
            for did, tl in corpus_tokens.items():
                hits = [j for j, t in enumerate(tl) if t == term]
                if hits:
                    p = hits[0]
                    expect[did] = (p, " ".join(
                        tl[max(p - W, 0):p + W + 1]))
        got = {int(r.doc_id): (int(r.pos), r.snippet)
               for r in res[res.query_id == qid].itertuples()}
        assert got == expect, (qid, tid)


def test_sharded_phrase_matches_unsharded(spark, pos_index, tmp_path):
    from dint_spark.queries import run_proximity_queries
    from dint_spark.sharding import (build_sharded_index,
                                     run_phrase_queries_sharded,
                                     run_proximity_queries_sharded)

    pages = generate_pages(spark, N_DOCS, seed=42)
    sidx = build_sharded_index(
        spark, pages, str(tmp_path / "spos"), num_shards=2,
        config=IndexConfig(num_buckets=2, input_tag="spos", positions=True))
    phrases = [[0, 1], [1, 0], [2, 3, 4], [0, 0], [6], [5, 99999999]]

    def norm(df):
        return (df.toPandas().sort_values(["query_id", "doc_id"])
                .reset_index(drop=True))

    a = norm(run_phrase_queries(spark, pos_index, phrases))
    b = norm(run_phrase_queries_sharded(spark, sidx, phrases))
    assert len(a) and a.equals(b)
    pairs = [[0, 1], [1, 0], [3, 4]]
    c = norm(run_proximity_queries(spark, pos_index, pairs, window=5))
    d = norm(run_proximity_queries_sharded(spark, sidx, pairs, window=5))
    assert len(c) and c.equals(d)


def test_served_phrase_matches_shuffle_path(spark, pos_index):
    from dint_spark.queries import (BroadcastQueryServer, run_phrase_queries,
                                    run_proximity_queries)

    srv = BroadcastQueryServer(spark, pos_index, with_positions=True)
    phrases = [[0, 1], [1, 0], [2, 3, 4], [0, 0], [6], [5, 99999999]]

    def norm(df):
        return (df.toPandas().sort_values(["query_id", "doc_id"])
                .reset_index(drop=True))

    a = norm(run_phrase_queries(spark, pos_index, phrases))
    b = norm(srv.serve_phrases(phrases))
    assert len(a) and a.equals(b)
    pairs = [[0, 1], [1, 0], [3, 3]]
    c = norm(run_proximity_queries(spark, pos_index, pairs, window=5))
    d = norm(srv.serve_proximity(pairs, window=5))
    assert len(c) and c.equals(d)
    # a non-positional server refuses the phrase path
    import pytest as _pytest
    plain = BroadcastQueryServer(spark, pos_index)  # positions not pinned
    with _pytest.raises(ValueError, match="with_positions"):
        plain.serve_phrases(phrases)
    srv.close()


def test_served_phrase_respects_deletes(spark, tmp_path):
    from dint_spark.index import delete_docs
    from dint_spark.queries import BroadcastQueryServer, run_phrase_queries

    pages = generate_pages(spark, 120, seed=55)
    idx = build_index(spark, pages, str(tmp_path / "posdel"),
                      IndexConfig(num_buckets=1, input_tag="posdel",
                                  positions=True))
    full = run_phrase_queries(spark, idx, [[0, 1], [2]]).toPandas()
    dead = sorted({int(d) for d in full.doc_id})[::3]
    assert dead
    delete_docs(spark, idx, dead)
    srv = BroadcastQueryServer(spark, idx, with_positions=True)
    got = srv.serve_phrases([[0, 1], [2]]).toPandas()
    assert len(got) and not set(got.doc_id) & set(dead)
    survivors = (full[~full.doc_id.isin(dead)]
                 .sort_values(["query_id", "doc_id"]).reset_index(drop=True))
    assert (got.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
            .equals(survivors))
    srv.close()


def test_phrase_ranked_scores_and_served_path(spark, pos_index):
    """run_phrase_queries_ranked: result docs == phrase matches (top-k
    capped), scores == run_queries over the same terms (match on phrase,
    rank on BM25 of its terms), served == shuffle, doc_filter applies."""
    import pyspark.sql.functions as F

    from dint_spark.queries import (BroadcastQueryServer, build_doc_filter,
                                    run_phrase_queries,
                                    run_phrase_queries_ranked, run_queries)

    phrases = [[0, 1], [1, 0], [2, 3, 4], [0, 0], [6], [5, 99999999]]
    ranked = run_phrase_queries_ranked(spark, pos_index, phrases, k=10,
                                       dtype="float64").toPandas()
    match = run_phrase_queries(spark, pos_index, phrases).toPandas()
    for q in range(len(phrases)):
        md = set(match[match.query_id == q].doc_id)
        sub = ranked[ranked.query_id == q].sort_values("rank")
        assert set(sub.doc_id) <= md
        assert len(sub) == min(10, len(md))
        # ranks are contiguous, scores non-increasing, ties doc asc
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        s = sub.score.to_numpy()
        assert (s[:-1] >= s[1:]).all()
    # scores equal the ranked kernels' BM25 over the same terms
    rq = run_queries(spark, pos_index, phrases, algo="ranked_or",
                     k=pos_index.num_docs, dtype="float64").toPandas()
    mr = ranked.merge(rq, on=["query_id", "doc_id"], suffixes=("", "_rq"))
    assert len(mr) == len(ranked)
    assert np.array_equal(mr.score.to_numpy(), mr.score_rq.to_numpy())
    # served path identical
    srv = BroadcastQueryServer(spark, pos_index, with_positions=True,
                               dtype="float64")
    sv = srv.serve_phrases_ranked(phrases, k=10).toPandas()
    a = ranked.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = sv.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
    # doc_filter restricts both paths identically
    dl = spark.read.parquet(f"{pos_index.dir}/doclens.parquet")
    dm = build_doc_filter(spark, dl.filter(F.col("len") >= 60),
                          pos_index.num_docs)
    fr = run_phrase_queries_ranked(spark, pos_index, phrases, k=10,
                                   dtype="float64",
                                   doc_filter=dm).toPandas()
    assert len(fr) and all(dm.mask[d] for d in fr.doc_id)
    fs = srv.serve_phrases_ranked(phrases, k=10, doc_filter=dm).toPandas()
    af = fr.sort_values(["query_id", "rank"]).reset_index(drop=True)
    bf = fs.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert af.equals(bf)
    srv.close()


def test_highlight_window_law_bruteforce(spark, tmp_path):
    """run_highlight_queries' chosen window must be THE optimum over all
    anchored windows by (distinct terms desc, hits desc, start asc), and
    the snippet must be the exact token slice — verified against a pure
    pandas brute force over the tokenized corpus."""
    import re

    import numpy as np

    from dint_spark.corpus import generate_pages
    from dint_spark.index import IndexConfig, build_index
    from dint_spark.queries import run_highlight_queries

    pages = generate_pages(spark, 150, seed=55)
    d = str(tmp_path / "hl")
    idx = build_index(spark, pages, d, IndexConfig(
        num_buckets=2, input_tag="hl150", positions=True))
    docs = (pages.toPandas().sort_values("url").reset_index(drop=True)
            .reset_index().rename(columns={"index": "doc_id"}))
    sdocs = spark.createDataFrame(docs[["doc_id", "text"]])
    vocab = idx.vocab().toPandas().sort_values("term_id")
    W = 6
    specs = [[0, 1], [2, 5, 9], [3], [0, 2, 4, 8]]
    res = (run_highlight_queries(spark, idx, sdocs, specs, k=5, width=W)
           .toPandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    assert len(res)
    id2t = dict(zip(vocab.term_id.astype(int), vocab.term))
    toks_by_doc = {int(r.doc_id): [t for t in re.split(
        "[^0-9a-z]+", r.text.lower()) if t] for r in docs.itertuples()}
    for r in res.itertuples():
        toks = toks_by_doc[int(r.doc_id)]
        qterms = {id2t[t] for t in specs[int(r.query_id)]}
        occ = [i for i, t in enumerate(toks) if t in qterms]
        assert occ, "a BM25 hit must contain a query term"
        best = max(
            ((len({toks[j] for j in occ if p <= j < p + W}),
              sum(1 for j in occ if p <= j < p + W), -p) for p in occ))
        assert (int(r.n_terms), int(r.n_hits), -int(r.start)) == best, r
        assert r.snippet == " ".join(toks[int(r.start):int(r.start) + W])


def test_span_near_kernel_matches_bruteforce():
    """span_near_kernel (greedy minimal ordered chains with slop) ==
    a per-occurrence python brute force over random position sets,
    including repeated terms and multi-doc keys."""
    import numpy as np

    from dint_spark.queries import span_near_kernel, _POS_SHIFT

    rng = np.random.default_rng(3)
    for trial in range(60):
        k = int(rng.integers(2, 5))
        slop = int(rng.integers(0, 5))
        n_docs = int(rng.integers(1, 6))
        occ = []  # per term: sorted (doc<<32|pos) keys
        posmap = []
        for _ in range(k):
            keys = []
            for d in range(n_docs):
                ps = np.unique(rng.integers(0, 40,
                                            size=rng.integers(0, 8)))
                keys += [(d << 32) | int(p) for p in ps]
            occ.append(np.array(sorted(keys), dtype=np.uint64))
            posmap.append({d: sorted(int(kk & 0xFFFFFFFF)
                                     for kk in keys if kk >> 32 == d)
                           for d in range(n_docs)})
        if any(not len(o) for o in occ):
            continue
        got_d, got_c = span_near_kernel(occ, slop)
        got = dict(zip(got_d.tolist(), got_c.tolist()))
        want: dict = {}
        for d in range(n_docs):
            cnt = 0
            for p1 in posmap[0].get(d, []):
                prev = p1
                okc = True
                for t in range(1, k):
                    nxt = [q for q in posmap[t].get(d, []) if q > prev]
                    if not nxt:
                        okc = False
                        break
                    prev = nxt[0]
                if okc and prev - p1 - (k - 1) <= slop:
                    cnt += 1
            if cnt:
                want[d] = cnt
        assert got == want, (trial, k, slop, got, want)


def test_span_near_unordered_kernel_matches_bruteforce():
    """span_near_unordered_kernel (per-start minimal enclosing window,
    any order) == a python brute force over random position sets."""
    import numpy as np

    from dint_spark.queries import span_near_unordered_kernel

    rng = np.random.default_rng(9)
    for trial in range(60):
        k = int(rng.integers(1, 5))
        slop = int(rng.integers(0, 6))
        n_docs = int(rng.integers(1, 5))
        occ, posmap = [], []
        for _ in range(k):
            keys = []
            for d in range(n_docs):
                ps = np.unique(rng.integers(0, 30,
                                            size=rng.integers(0, 7)))
                keys += [(d << 32) | int(p) for p in ps]
            occ.append(np.array(sorted(keys), dtype=np.uint64))
            posmap.append({d: sorted(int(kk & 0xFFFFFFFF)
                                     for kk in keys if kk >> 32 == d)
                           for d in range(n_docs)})
        if any(not len(o) for o in occ):
            continue
        got_d, got_c = span_near_unordered_kernel(occ, slop)
        got = dict(zip(got_d.tolist(), got_c.tolist()))
        want: dict = {}
        for d in range(n_docs):
            starts = sorted({p for t in range(k)
                             for p in posmap[t].get(d, [])})
            cnt = 0
            for p0 in starts:
                ends = []
                okc = True
                for t in range(k):
                    nxt = [q for q in posmap[t].get(d, []) if q >= p0]
                    if not nxt:
                        okc = False
                        break
                    ends.append(nxt[0])
                if okc and max(ends) - p0 - (k - 1) <= slop:
                    cnt += 1
            if cnt:
                want[d] = cnt
        assert got == want, (trial, k, slop, got, want)

"""Retrieval kernels vs the independent exhaustive float32 oracle
(FIXTURES.md F3/F4; reference contract: test/test_ranked_queries.cpp —
we require exact float32 equality for or/and/wand/bmw, rank-identity +
1e-4 relative for maxscore whose accumulation order differs by design)."""

import numpy as np
import pytest

from fixtures import (
    build_dicts,
    build_segments,
    gen_collection,
    gen_queries,
    make_cursors,
    oracle_topk,
)
from dint_spark.queries import (
    block_max_wand_vec,
    boolean_and,
    boolean_or,
    maxscore,
    ranked_and,
    ranked_or,
    ranked_or_vec,
    wand,
)


@pytest.fixture(scope="module")
def collection():
    plists, doclens, N, docs_tokens = gen_collection(600, seed=42, vocab=1500)
    queries = gen_queries(docs_tokens, 80)
    docs_dict, freqs_dict = build_dicts(plists)
    segs, norm = build_segments(plists, doclens, docs_dict, freqs_dict)
    return plists, doclens, N, queries, docs_dict, freqs_dict, segs, norm


@pytest.mark.parametrize(
    "algo", ["ranked_or", "ranked_or_vec", "wand", "bmw", "bmw_vec"])
def test_exact_float32_rank_identity(collection, algo):
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    fn = {
        "ranked_or": lambda cs: ranked_or(cs, norm, N, 10),
        "ranked_or_vec": lambda cs: ranked_or_vec(cs, norm, N, 10),
        "wand": lambda cs: wand(cs, norm, N, 10),
        "bmw": lambda cs: wand(cs, norm, N, 10, block_max=True),
        "bmw_vec": lambda cs: block_max_wand_vec(cs, norm, N, 10),
    }[algo]
    for q in queries:
        oracle = oracle_topk(q, plists, doclens, N, k=10)
        cs = make_cursors(q, segs, dd, fd, norm, N)
        assert fn(cs) == oracle


def test_maxscore_rank_identity(collection):
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    for q in queries:
        oracle = oracle_topk(q, plists, doclens, N, k=10)
        cs = make_cursors(q, segs, dd, fd, norm, N)
        got = maxscore(cs, norm, N, 10)
        assert [d for d, _ in got] == [d for d, _ in oracle]
        assert np.allclose([s for _, s in got], [s for _, s in oracle],
                           rtol=1e-4)


def test_ranked_and_exact(collection):
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    for q in queries[:40]:
        terms = sorted(set(int(t) for t in q if int(t) in plists))
        if not terms:
            continue
        inter = set.intersection(*[set(plists[t][0].tolist()) for t in terms])
        oracle = [(d, s) for d, s in oracle_topk(q, plists, doclens, N, k=10**9)
                  if d in inter][:10]
        cs = make_cursors(q, segs, dd, fd, norm, N)
        assert ranked_and(cs, norm, N, 10) == oracle


def test_boolean_set_semantics(collection):
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    for q in queries[:40]:
        terms = sorted(set(int(t) for t in q if int(t) in plists))
        if not terms:
            continue
        sets = [set(plists[t][0].tolist()) for t in terms]
        cs = make_cursors(q, segs, dd, fd, norm, N)
        assert boolean_and(cs, N) == sorted(set.intersection(*sets))
        cs = make_cursors(q, segs, dd, fd, norm, N)
        assert boolean_or(cs, N) == sorted(set.union(*sets))


def test_enumerator_laws(collection):
    """next/next_geq/move-equivalents vs the plain arrays
    (port of test_generic_sequence.hpp:28-163 semantics)."""
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    rng = np.random.default_rng(11)
    terms = rng.choice(list(plists), size=30, replace=False)
    for t in terms:
        docs, freqs = plists[int(t)]
        cs = make_cursors([int(t)], segs, dd, fd, norm, N)
        c = cs[0]
        # full scan: next() visits exactly the list
        for i in range(len(docs)):
            assert c.docid() == docs[i]
            assert c.freq() == freqs[i]
            c.next()
        assert c.docid() == N

        # next_geq sweeps: every lower bound lands on the true successor
        cs = make_cursors([int(t)], segs, dd, fd, norm, N)
        c = cs[0]
        for lb in sorted(rng.integers(0, N + 1, size=50).tolist()):
            c.next_geq(lb)
            j = np.searchsorted(docs, lb, side="left")
            if j == len(docs):
                assert c.docid() == N
            else:
                assert c.docid() == docs[j]
                assert c.freq() == freqs[j]


def test_cursor_move(collection):
    """Q3 move(pos) random access (ref dict_posting_list.hpp:149-158)."""
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    rng = np.random.default_rng(13)
    for t in rng.choice(list(plists), size=10, replace=False):
        docs, freqs = plists[int(t)]
        c = make_cursors([int(t)], segs, dd, fd, norm, N)[0]
        for pos in rng.integers(0, len(docs) + 2, size=20).tolist():
            c.move(int(pos))
            if pos >= len(docs):
                assert c.docid() == N
            else:
                assert c.docid() == docs[pos]
                assert c.freq() == freqs[pos]


def test_decode_cache_no_freq_aliasing(collection):
    """Regression (ADVICE r2): two lists with identical docids but different
    freqs must not share a worker-LRU entry — the old prefix-based key
    aliased them and served stale frequencies."""
    plists, doclens, N, queries, dd, fd, segs, norm = collection
    t = int(next(iter(plists)))
    docs, freqs = plists[t]
    c1 = make_cursors([t], segs, dd, fd, norm, N)[0]
    d1, f1 = c1.decode_all()
    assert np.array_equal(d1, docs) and np.array_equal(f1, freqs)
    # same docids, different freqs -> different payload bytes after the docs
    # stream; the old key (term_id, n, last docid, payload[:24]) collided
    # whenever the docs stream filled the 24-byte prefix
    freqs2 = freqs.copy()
    freqs2[-1] += 1
    seg2 = build_segments({t: (docs, freqs2)}, doclens, dd, fd)[0]
    c2 = make_cursors([t], seg2, dd, fd, norm, N)[0]
    d2, f2 = c2.decode_all()
    assert np.array_equal(d2, docs)
    assert np.array_equal(f2, freqs2), "stale freqs served from the LRU"

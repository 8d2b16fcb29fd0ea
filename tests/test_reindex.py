"""_reindex (compact.reindex_index): rebuilding an index FROM ITSELF
under a new analysis chain equals a fresh build over the transformed
corpus — postings, stats and query results.

The multiset argument: the analyzer chain (stopword drop + S-stem) is
per-token, so transforming the multiset reconstruction equals
reconstructing the transformed corpus; no positions stream needed.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dint_spark.analyzer import analyze_documents, analyzed_tokens
from dint_spark.compact import reindex_index
from dint_spark.corpus import generate_pages
from dint_spark.index import IndexConfig, build_index
from dint_spark.queries import decoded_postings, run_queries


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 400, seed=11).persist()


def _posting_rows(idx):
    return sorted(
        (int(r["term_id"]), int(r["doc_id"]), int(r["freq"]))
        for r in decoded_postings(idx).collect())


def test_reindex_equals_fresh_analyzed_build(spark, tmp_path, pages):
    base_dir, re_dir, fresh_dir = (str(tmp_path / d) for d in
                                   ("base", "re", "fresh"))
    for d in (base_dir, re_dir, fresh_dir):
        shutil.rmtree(d, ignore_errors=True)
    base = build_index(spark, pages, base_dir,
                       IndexConfig(num_buckets=2, input_tag="ri"))
    re_idx = reindex_index(spark, base, re_dir,
                           token_transform=analyzed_tokens)
    fresh = build_index(
        spark, analyze_documents(pages), fresh_dir,
        IndexConfig(num_buckets=2, input_tag="reindex:ri"))

    assert re_idx.num_docs == fresh.num_docs
    assert re_idx.num_terms == fresh.num_terms
    assert _posting_rows(re_idx) == _posting_rows(fresh)

    # identical inputs -> identical learned dictionaries -> identical
    # ranked results through the real kernel
    tids = [r["term_id"] for r in
            fresh.vocab().orderBy("term_id").limit(8).collect()]
    specs = [[tids[0]], [tids[1], tids[3]], [tids[2], tids[5], tids[7]]]
    a = run_queries(spark, re_idx, specs, algo="block_max_wand",
                    k=10).collect()
    b = run_queries(spark, fresh, specs, algo="block_max_wand",
                    k=10).collect()
    assert sorted(((r["query_id"], r["rank"], r["doc_id"])
                   for r in a)) == \
        sorted(((r["query_id"], r["rank"], r["doc_id"]) for r in b))


def test_reindex_identity_without_transform(spark, tmp_path, pages):
    """No transform -> reindex degenerates to an identity rewrite."""
    base_dir, re_dir = str(tmp_path / "b2"), str(tmp_path / "r2")
    base = build_index(spark, pages, base_dir,
                       IndexConfig(num_buckets=2, input_tag="ri2"))
    re_idx = reindex_index(spark, base, re_dir)
    assert _posting_rows(re_idx) == _posting_rows(base)


def test_decoded_postings_term_subset_contract(spark, tmp_path, pages,
                                               monkeypatch):
    """term_ids restricts the output EXACTLY on both pushdown paths —
    the isin scan filter and the over-bound bucket-prune + semi-join
    (same-bucket strangers must not leak)."""
    import dint_spark.queries as Q
    from dint_spark.queries import decoded_postings

    idx = build_index(spark, pages, str(tmp_path / "sub"),
                      IndexConfig(num_buckets=2, input_tag="sub"))
    want = [1, 3, 5]
    small = {int(r["term_id"]) for r in
             decoded_postings(idx, term_ids=want)
             .select("term_id").distinct().collect()}
    assert small == set(want)
    monkeypatch.setattr(Q, "_DECODE_ISIN_BOUND", 1)
    big = {int(r["term_id"]) for r in
           decoded_postings(idx, term_ids=want)
           .select("term_id").distinct().collect()}
    assert big == set(want)

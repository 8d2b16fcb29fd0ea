"""Free-text search front end (dint_spark.search).

Contract: query strings tokenize under the index's pinned contract,
term ids resolve through a pushed-filter vocab scan (never a full-vocab
collect), OOV terms drop per query, and retrieval equals run_queries /
run_phrase_queries_ranked over the manually resolved ids.
"""

from __future__ import annotations

import shutil

import pytest

from dint_spark.search import (lookup_term_ids, parse_queries, search_text,
                               tokenize_query)

N_DOCS = 300
IDX_DIR = "/tmp/dint_spark_test/search300"


@pytest.fixture(scope="module")
def sidx(spark):
    from dint_spark.corpus import generate_pages
    from dint_spark.index import IndexConfig, build_index

    shutil.rmtree(IDX_DIR, ignore_errors=True)
    pages = generate_pages(spark, N_DOCS, seed=77)
    return build_index(
        spark, pages, IDX_DIR,
        IndexConfig(num_buckets=2, input_tag="search300", positions=True))


def test_tokenize_query_pinned_contract():
    assert tokenize_query("Sort-Merge JOIN!") == ["sort", "merge", "join"]
    assert tokenize_query("  the THE the ") == ["the", "the", "the"]
    assert tokenize_query("") == []
    assert tokenize_query(None) == []
    assert tokenize_query("a1b2, c3") == ["a1b2", "c3"]
    # nfc mode matches the plain path on pure ASCII
    assert tokenize_query("Hash Join", nfc=True) == ["hash", "join"]


def test_lookup_and_parse(spark, sidx):
    vocab = sidx.vocab().toPandas()
    w0 = vocab.sort_values("term_id").term.iloc[0]
    w1 = vocab.sort_values("term_id").term.iloc[1]
    got = lookup_term_ids(sidx, [w0, w1, "zzzznotaword", w0])
    assert got == sidx.term_ids([w0, w1])  # ids agree with full-map path
    specs, oov = parse_queries(sidx, [f"{w0} {w1}", f"{w0} zzzznotaword",
                                      "zzzznotaword", ""])
    assert specs[0] == [got[w0], got[w1]]
    assert specs[1] == [got[w0]] and oov[1] == ["zzzznotaword"]
    assert specs[2] == [] and oov[2] == ["zzzznotaword"]
    assert specs[3] == [] and oov[3] == []


def test_search_text_equals_manual_ids(spark, sidx):
    from dint_spark.queries import run_queries

    vocab = sidx.vocab().toPandas().sort_values("term_id")
    words = vocab.term.tolist()
    queries = [f"{words[0]} {words[1]}",
               f"{words[2].upper()}, {words[5]}!",      # tokenizer case/punct
               f"{words[0]} {words[0]} {words[9]}",     # duplicate -> qf 2
               f"{words[3]} notinvocabulary",           # partial OOV
               "fully oov query zzz"]                   # no rows expected
    got = search_text(spark, sidx, queries, k=10).toPandas()
    specs, _ = parse_queries(sidx, queries)
    want = run_queries(spark, sidx, specs, algo="block_max_wand_vec",
                       k=10).toPandas()
    a = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(a) and a.equals(b)
    assert 4 not in set(a.query_id)  # fully-OOV query yields nothing


def test_search_text_phrase_mode(spark, sidx):
    from dint_spark.queries import run_phrase_queries_ranked

    vocab = sidx.vocab().toPandas().sort_values("term_id")
    words = vocab.term.tolist()
    queries = [f"{words[0]} {words[1]}",
               f"{words[1]} {words[0]}",
               f"{words[0]} notinvocabulary"]  # OOV inside a phrase
    got = search_text(spark, sidx, queries, k=10, phrase=True).toPandas()
    # any-OOV phrase returns no rows (it cannot match anywhere)
    assert 2 not in set(got.query_id)
    specs, _ = parse_queries(sidx, queries[:2])
    want = run_phrase_queries_ranked(spark, sidx, specs, k=10).toPandas()
    a = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(a) and a.equals(b)


def test_vocab_lookup_pushes_filter(spark, sidx):
    """The term IN (...) predicate must reach the vocab parquet scan —
    the property that keeps text queries viable at a 10^8-term web
    vocabulary (only matching rows return to the driver)."""
    import pyspark.sql.functions as F

    w = sidx.vocab().toPandas().term.iloc[0]
    plan = (sidx.vocab().filter(F.col("term").isin([w, "zz"]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [In(term" in plan, plan

"""Index merge: array-level postings merge + whole-index merge equivalence."""

import os

import numpy as np
import pytest

from dint_spark.corpus import pages_from_documents
from dint_spark.index import IndexConfig, build_index
from dint_spark.merge import merge_indexes, merge_postings
from dint_spark.queries import decoded_postings, run_queries

SF = "/root/testdata/sf0.001"


def test_merge_postings_arrays(spark):
    pa = spark.createDataFrame(
        [(0, 2, [1, 5], [2, 3], [10, 20]), (1, 1, [4], [1], [7])],
        "term_id long, df int, doc_ids array<long>, freqs array<long>, lens array<long>",
    )
    pb = spark.createDataFrame(
        [(0, 2, [3, 5], [1, 4], [30, 20]), (2, 1, [9], [2], [5])],
        "term_id long, df int, doc_ids array<long>, freqs array<long>, lens array<long>",
    )
    got = {
        r["term_id"]: (r["doc_ids"], r["freqs"])
        for r in merge_postings(pa, pb).collect()
    }
    assert got[0] == ([1, 3, 5], [2, 1, 7])  # doc 5 collides: 3+4
    assert got[1] == ([4], [1])
    assert got[2] == ([9], [2])


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")
def test_merge_indexes_equals_full_build(spark, tmp_path):
    """Two url-ordered halves merged == single-shot build: identical decoded
    postings AND identical BMW top-k."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    pages = pages_from_documents(docs)
    half_a = pages_from_documents(docs.where("doc_id < 25"))
    half_b = pages_from_documents(docs.where("doc_id >= 25"))

    cfg = lambda tag: IndexConfig(num_buckets=2, input_tag=tag)
    full = build_index(spark, pages, str(tmp_path / "full"), cfg("full"))
    ia = build_index(spark, half_a, str(tmp_path / "a"), cfg("a"))
    ib = build_index(spark, half_b, str(tmp_path / "b"), cfg("b"))
    merged = merge_indexes(
        spark, str(tmp_path / "a"), str(tmp_path / "b"),
        str(tmp_path / "merged"), cfg("merged"),
    )

    key = ["term_id", "doc_id"]
    pm = decoded_postings(merged).toPandas().sort_values(key).reset_index(drop=True)
    pf = decoded_postings(full).toPandas().sort_values(key).reset_index(drop=True)
    assert pm.equals(pf)
    assert merged.num_docs == full.num_docs
    assert merged.num_terms == full.num_terms

    qs = [[0], [1, 3], [0, 2, 5]]
    rm = run_queries(spark, merged, qs, algo="block_max_wand", k=10).toPandas()
    rf = run_queries(spark, full, qs, algo="block_max_wand", k=10).toPandas()
    skey = ["query_id", "rank"]
    rm = rm.sort_values(skey).reset_index(drop=True)
    rf = rf.sort_values(skey).reset_index(drop=True)
    assert rm[["query_id", "rank", "doc_id"]].equals(
        rf[["query_id", "rank", "doc_id"]]
    )
    assert np.array_equal(
        rm["score"].to_numpy(np.float32), rf["score"].to_numpy(np.float32)
    )


def test_merge_pre_ttf_index(spark, tmp_path):
    """ADVICE r3: merge_indexes must accept indexes whose vocabularies
    predate ttf metadata — the backfill recomputes ttf exactly from the
    postings checkpoint, so the merged vocabulary matches a merge of
    two ttf-carrying builds."""
    import shutil

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    half_a = pages_from_documents(docs.where("doc_id < 25"))
    half_b = pages_from_documents(docs.where("doc_id >= 25"))
    cfg = lambda tag: IndexConfig(num_buckets=2, input_tag=tag)
    build_index(spark, half_a, str(tmp_path / "a"), cfg("a"))
    build_index(spark, half_b, str(tmp_path / "b"), cfg("b"))
    m_ref = merge_indexes(spark, str(tmp_path / "a"), str(tmp_path / "b"),
                          str(tmp_path / "m_ref"), cfg("mref"))
    ref_vocab = m_ref.vocab().toPandas().sort_values("term_id")

    # strip ttf from BOTH inputs, re-merge through the backfill path
    for d in ("a", "b"):
        vf = str(tmp_path / d / "vocab.parquet")
        stripped = spark.read.parquet(vf).drop("ttf").toPandas()
        shutil.rmtree(vf)
        spark.createDataFrame(stripped).write.parquet(vf)
    m2 = merge_indexes(spark, str(tmp_path / "a"), str(tmp_path / "b"),
                       str(tmp_path / "m2"), cfg("m2"))
    got = m2.vocab().toPandas().sort_values("term_id")
    assert got.reset_index(drop=True).equals(
        ref_vocab.reset_index(drop=True))

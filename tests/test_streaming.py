"""Structured-Streaming ingestion + incremental compaction."""

import os

import pytest

from dint_spark.corpus import pages_from_documents
from dint_spark.index import IndexConfig, build_index
from dint_spark.queries import decoded_postings
from dint_spark.streaming import (
    compact,
    compact_incremental,
    stream_ingest,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")
def test_stream_ingest_and_incremental_compact(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    input_dir = str(tmp_path / "incoming")
    work_dir = str(tmp_path / "work")
    os.makedirs(input_dir)

    cfg = IndexConfig(num_buckets=2, input_tag="stream")

    # wave 1: docs 0-19 and 20-34 as two files (url order = doc_id order)
    pages_from_documents(docs.where("doc_id < 20")).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(input_dir, "w1"))
    pages_from_documents(
        docs.where("doc_id >= 20 and doc_id < 35")
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(input_dir, "w2"))

    n_total = docs.count()
    state = stream_ingest(spark, input_dir + "/*", work_dir)
    assert sum(b["rows"] for b in state["batches"].values()) == 35

    idx1 = compact(spark, work_dir, cfg)
    assert idx1.num_docs == 35

    # wave 2: the remaining docs arrive later (urls sort after wave 1's)
    pages_from_documents(docs.where("doc_id >= 35")).coalesce(1).write.mode(
        "overwrite").parquet(os.path.join(input_dir, "w3"))
    state = stream_ingest(spark, input_dir + "/*", work_dir)
    assert sum(b["rows"] for b in state["batches"].values()) == n_total

    idx2 = compact_incremental(spark, work_dir, cfg)
    assert idx2.num_docs == n_total

    # equivalence with the one-shot batch build over the full corpus
    full = build_index(
        spark, pages_from_documents(docs), str(tmp_path / "full"),
        IndexConfig(num_buckets=2, input_tag="full"),
    )
    key = ["term_id", "doc_id"]
    pi = decoded_postings(idx2).toPandas().sort_values(key).reset_index(drop=True)
    pf = decoded_postings(full).toPandas().sort_values(key).reset_index(drop=True)
    assert pi.equals(pf)

    # ingest with nothing new is a no-op generation-wise
    idx3 = compact_incremental(spark, work_dir, cfg)
    assert idx3.dir == idx2.dir

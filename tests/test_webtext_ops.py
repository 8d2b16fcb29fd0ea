"""Signal tests for the webtext curation ops whose behavior the synthetic
driver corpus can't exercise (it contains no PII, and its span duplication
is incidental): constructed fixtures with known answers."""

import os

import pytest
from pyspark.sql import functions as F

from dint_spark.ops import webtext


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    rows = [
        # two docs sharing a verbatim 5-token span; doc 2 unique
        (0, "alpha beta gamma delta epsilon zeta unique tail zero", "en",
         "srcA"),
        (1, "prefix one alpha beta gamma delta epsilon different end", "en",
         "srcA"),
        (2, "totally different words with no overlap at all here", "de",
         "srcB"),
        # PII: one email, one ipv4, one long number
        (3, "contact me at john.doe+x@example.org or 10.0.42.7 ref "
            "123456789012 thanks", "en", "srcB"),
        # exact duplicate pair within srcA
        (4, "dup body text here", "en", "srcA"),
        (5, "dup body text here", "en", "srcA"),
        (6, "", "en", "srcB"),  # empty doc: zero tokens everywhere
    ]
    d = tmp_path_factory.mktemp("webtext_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_pii_scrub_counts_and_redaction(spark, docs_dir):
    out = {r["doc_id"]: r for r in
           webtext.pii_scrub(spark, docs_dir).collect()}
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_longnum"]) == \
        (1, 1, 1)
    for i in (0, 1, 2, 4, 5, 6):
        assert (out[i]["n_email"], out[i]["n_ipv4"], out[i]["n_longnum"]) \
            == (0, 0, 0)
    # clean docs keep their original fingerprint; the PII doc does not
    from dint_spark.ops.common import hash60
    fps = {r["doc_id"]: r["fp"] for r in spark.read.parquet(
        os.path.join(docs_dir, "documents.parquet")).select(
        "doc_id", hash60(F.col("text")).alias("fp")).collect()}
    assert out[0]["clean_fp"] == fps[0]
    assert out[3]["clean_fp"] != fps[3]


def test_span_dedup_shared_spans(spark, docs_dir):
    out = {r["doc_id"]: r for r in
           webtext.span_dedup(spark, docs_dir).collect()}
    # docs 0 and 1 share exactly one 5-token span
    # ("alpha beta gamma delta epsilon")
    assert out[0]["n_shared"] == 1 and out[1]["n_shared"] == 1
    assert out[2]["n_shared"] == 0
    # the duplicate pair shares nothing (4 tokens < SPAN_K)
    assert out[4]["n_spans"] == 0 and out[6]["n_spans"] == 0
    assert out[0]["n_spans"] == 5  # 9 tokens -> 5 spans


def test_domain_stats(spark, docs_dir):
    out = {r["source"]: r for r in
           webtext.domain_stats(spark, docs_dir).collect()}
    assert out["srcA"]["n_docs"] == 4 and out["srcB"]["n_docs"] == 3
    assert out["srcA"]["dup_docs"] == 1  # docs 4/5 identical
    assert out["srcB"]["dup_docs"] == 0
    assert out["srcB"]["n_langs"] == 2  # de + en


def test_unigram_logprob_orders_docs(spark, docs_dir):
    out = {r["doc_id"]: r for r in
           webtext.unigram_logprob(spark, docs_dir).collect()}
    assert out[6]["n_tokens"] == 0 and out[6]["avg_logp_q"] == 0
    # the duplicated doc is made of corpus-frequent tokens -> higher
    # (less negative) average log-prob than the all-unique doc 2
    assert out[4]["avg_logp_q"] > out[2]["avg_logp_q"]
    for i in range(6):
        assert out[i]["avg_logp_q"] < 0

"""Posting-list construction — the shuffle core.

pages -> tokenize -> explode -> (term_id, doc_id, tf) hash agg ->
salted repartition-by-term with explicit skew splitting of head terms ->
postings(term_id, df, doc_ids[], freqs[], lens[]).

Skew story (SURVEY §7.2): Zipfian head terms have posting lists ~N long. A
plain groupBy(term_id).collect_list would put an entire head list in one
task. We split every term whose df exceeds `chunk` into doc-range chunks
(salt = doc_id // chunk), build each chunk's sorted arrays in its own task,
then merge the few chunks per term with a cheap second aggregation
(arrays are pre-sorted and chunk doc-ranges are disjoint+increasing, so the
merge is sort_array(collect_list(struct(salt,...))) + flatten — no resort of
postings). This is the reference's ordered parallel build
(include/ds2i/semiasync_queue.hpp) re-expressed as a sort-merge shuffle.

At 10^12 docs the same plan holds: the first agg is map-side combinable,
the salted second shuffle bounds any task's data by `chunk`, and AQE skew
splitting is a second line of defence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SKEW_CHUNK = 1 << 18  # max postings per build task for one term


def term_doc_freqs(doc_tokens: DataFrame, vocab: DataFrame) -> DataFrame:
    """(term_id, doc_id, tf) — Catalyst hash aggregation with map-side
    partial combine; the vocab join is broadcast when small."""
    tf = (
        doc_tokens.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    vocab_slim = vocab.select("term", "term_id")
    return tf.join(vocab_slim, "term").select("term_id", "doc_id", "tf")


def build_postings(
    term_doc_tf: DataFrame,
    doclens: DataFrame,
    skew_chunk: int = DEFAULT_SKEW_CHUNK,
) -> DataFrame:
    """postings(term_id, df, doc_ids, freqs, lens), doc_ids strictly
    increasing. lens are the per-posting document lengths (needed by the
    encoder for block-max BM25 metadata; dropped after encode)."""
    with_len = term_doc_tf.join(doclens, "doc_id")

    salted = with_len.withColumn(
        "salt", (F.col("doc_id") / F.lit(skew_chunk)).cast("long")
    )

    chunks = (
        salted.groupBy("term_id", "salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "len"))
            ).alias("chunk")
        )
        .select(
            "term_id",
            "salt",
            F.col("chunk.doc_id").alias("doc_ids"),
            F.col("chunk.tf").alias("freqs"),
            F.col("chunk.len").alias("lens"),
        )
    )

    merged = (
        chunks.groupBy("term_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("salt", "doc_ids", "freqs", "lens"))
            ).alias("parts")
        )
        .select(
            "term_id",
            F.flatten(F.col("parts.doc_ids")).alias("doc_ids"),
            F.flatten(F.col("parts.freqs")).alias("freqs"),
            F.flatten(F.col("parts.lens")).alias("lens"),
        )
        .withColumn("df", F.size("doc_ids"))
        .select("term_id", "df", "doc_ids", "freqs", "lens")
    )
    return merged

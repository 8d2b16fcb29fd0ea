"""Percolation: registered queries matched AGAINST incoming documents —
the ES percolator, the inverse of search. Alerting, saved-search
notification, and routing pipelines all sit on this primitive: the
query set is long-lived and small-ish, the documents stream through.

Semantics: a registered query is a bag of terms under the pinned
tokenizer; a document matches when it contains EVERY term (the boolean
AND the reference's conjunctive kernel computes — percolation is that
kernel with the roles of corpus and query swapped). Emits one
(query_id, doc_id) row per match.

Scale shape: the registered query table broadcasts (it is
queries x terms rows — thousands, not corpus-sized); the document side
streams through one JVM-side tokenize -> explode -> broadcast-hash-join
-> partial+final count aggregate. The only shuffle carries
(doc, query) candidate rows — bounded by per-term selectivity, with
map-side combine. No index is consulted and no per-doc Python runs, so
the same transform applies unchanged to a Structured Streaming
micro-batch (percolate_stream): stateless per batch, so append mode
needs no watermark.

No reference counterpart: fanhualta/dint has no doc-at-a-time query
matching; percolation is engine-completeness scope (the builder
brief's web-search surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dint_spark.search import tokenize_query


def register_queries(spark: SparkSession, queries: list[str],
                     nfc: bool = False) -> DataFrame:
    """Query strings -> the registered (query_id, term, n_terms) table.
    Duplicate terms within a query fold (containment needs each DISTINCT
    term once); queries with no tokens register nothing (they can never
    fire — the ES percolator's empty-query behavior)."""
    rows = []
    for qid, q in enumerate(queries):
        toks = sorted(set(tokenize_query(q, nfc=nfc)))
        rows += [(qid, t, len(toks)) for t in toks]
    return spark.createDataFrame(
        rows, schema=T.StructType([
            T.StructField("query_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("n_terms", T.IntegerType(), False),
        ]))


def percolate(docs: DataFrame, registered: DataFrame,
              id_col: str = "doc_id", text_col: str = "text"
              ) -> DataFrame:
    """Match every doc in ``docs`` against the registered query table.
    Returns (query_id, doc_id), one row per (query, matching doc).

    Works identically on a batch DataFrame and a streaming micro-batch
    (stateless: tokenize, DISTINCT doc terms, broadcast join, count
    per (doc, query) == n_terms)."""
    toks = (docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(F.filter(
            F.split(F.lower(F.col(text_col)), "[^0-9a-z]+"),
            lambda x: x != F.lit("")))).alias("term")))
    hits = toks.join(F.broadcast(registered), "term")
    return (hits.groupBy("query_id", "doc_id", "n_terms")
            .agg(F.count("*").alias("m"))
            .where(F.col("m") == F.col("n_terms"))
            .select("query_id", "doc_id"))


def percolate_stream(stream_docs: DataFrame, registered: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text"
                     ) -> DataFrame:
    """The same transform over a streaming DataFrame: percolation is
    stateless per micro-batch, so the result supports append-mode sinks
    with no watermark. (groupBy on a streaming frame would be a stateful
    aggregation; flagging matches per batch instead keeps it stateless —
    implemented via the identical plan, which Spark runs per batch in
    update/complete modes, or wrap `percolate` in foreachBatch for
    append sinks. This helper returns the transformed streaming frame.)"""
    return percolate(stream_docs, registered, id_col=id_col,
                     text_col=text_col)

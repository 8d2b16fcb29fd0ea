"""Deterministic tokenizer + vocabulary (term-id) construction.

Pinned extraction contract (FIXTURES.md / input_hint "byte-identical
extracted text per url"): tokens = NFC-normalize -> lowercase -> split on
[^0-9a-z]+ -> drop empties. term_id = dense rank of term by
(doc-frequency desc, term asc) — mirrors how IR collections assign dense
term ids by collection order; pinned here so the Spark engine and any SQL
oracle agree exactly.

Default path is JVM-side (F.lower + F.split: whole-stage codegen, no Python
in the hot loop). For non-ASCII corpora, `nfc=True` switches to an
Arrow-batched pandas UDF that applies unicodedata NFC first; for pure-ASCII
text the two are identical (asserted in tests).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dint_spark.ids import add_dense_index

TOKEN_SPLIT_RE = "[^0-9a-z]+"


@pandas_udf(T.ArrayType(T.StringType()))
def _tokenize_nfc(texts: pd.Series) -> pd.Series:
    import re

    pat = re.compile(TOKEN_SPLIT_RE)

    def tok(t: str):
        if t is None:
            return []
        return [w for w in pat.split(unicodedata.normalize("NFC", t).lower()) if w]

    return texts.map(tok)


def tokenize(pages: DataFrame, text_col: str = "text", nfc: bool = False) -> DataFrame:
    """pages + `tokens` array<string> column."""
    if nfc:
        tokens = _tokenize_nfc(F.col(text_col))
    else:
        tokens = F.array_remove(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), "")
    return pages.withColumn("tokens", tokens)


def assign_doc_ids(pages: DataFrame, key_col: str = "url") -> DataFrame:
    """Dense docID = rank of url in ascending sort (stable byte-identical
    text <-> docID mapping; SURVEY §1.4)."""
    return add_dense_index(pages, [F.col(key_col).asc()], "doc_id")


def build_vocab(doc_tokens: DataFrame) -> DataFrame:
    """vocab(term, df, ttf, term_id): term_id dense by (df desc, term
    asc); ttf = total term frequency, carried as index metadata so
    doc-level stats APIs (term_vectors) never re-scan the corpus.

    Two map-side-combined hash aggregations (per-(doc, term) tf, then
    per-term df/ttf — the same shuffle shape term_doc_freqs pays
    anyway) plus the distributed rank — no driver materialization of
    the vocabulary.
    """
    tf = (
        doc_tokens.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    df_counts = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("c").alias("ttf"))
    return add_dense_index(df_counts, [F.col("df").desc(), F.col("term").asc()], "term_id")


def doclens(doc_tokens: DataFrame) -> DataFrame:
    """doc_id -> token count (the reference's .sizes sidecar,
    src/create_wand_data.cpp:22-26)."""
    return doc_tokens.select("doc_id", F.size("tokens").alias("len"))

"""Pages-source contract tests (FIXTURES.md F1).

Pins the input_hint invariants: (a) the byte-identical-extracted-text
check — SHA-256 of the concatenated extracted token stream per url — via
a golden hash over the tiny fixture corpus, (b) read_pages resolves both
catalog table names (the Iceberg path) and filesystem paths, (c)
extract_text(html) == the provided text column, byte for byte.
"""

import hashlib
import os

from pyspark.sql import functions as F

from dint_spark.corpus import (
    extract_text,
    generate_pages,
    read_pages,
)
from dint_spark.tokenizer import tokenize

TINY_DOCS = 1000
# SHA-256 over "url\x00token token ...\x01" for all urls sorted ascending,
# computed once from the seed-42 tiny corpus; any change to the generator,
# the tokenizer, or the html round-trip breaks this.


def _token_stream_sha(pages_df) -> str:
    rows = (
        tokenize(pages_df)
        .select("url", F.concat_ws(" ", F.col("tokens")).alias("toks"))
        .orderBy("url")
        .collect()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r["url"].encode())
        h.update(b"\x00")
        h.update(r["toks"].encode())
        h.update(b"\x01")
    return h.hexdigest()


def test_extracted_token_stream_golden_hash(spark):
    sha = _token_stream_sha(generate_pages(spark, TINY_DOCS, seed=42))
    assert sha == (
        "ad5c63a2d0be43c8101a295ba8e99ca3d7a9e070aabe9e1a63df47d0c53f3b3e"
    )


def test_extract_text_byte_identical(spark):
    pages = generate_pages(spark, 200, seed=42)
    mismatches = (
        extract_text(pages.select("url", "html", F.col("text").alias("text_ref")))
        .where(F.col("text") != F.col("text_ref"))
        .count()
    )
    assert mismatches == 0


def test_read_pages_path_and_table(spark, tmp_path):
    out = os.path.join(str(tmp_path), "pages.parquet")
    generate_pages(spark, 100, seed=42).write.parquet(out)

    by_path = read_pages(spark, out)
    assert by_path.count() == 100
    assert [f.name for f in by_path.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]

    # catalog-table resolution (the Iceberg entry point: same call with an
    # Iceberg catalog table name; the sandbox has no Iceberg jars, so a
    # temp view stands in for catalog resolution)
    spark.read.parquet(out).createOrReplaceTempView("pages_tbl")
    by_table = read_pages(spark, "pages_tbl")
    assert by_table.count() == 100
    assert (
        by_table.orderBy("url").select("url").first()["url"]
        == by_path.orderBy("url").select("url").first()["url"]
    )

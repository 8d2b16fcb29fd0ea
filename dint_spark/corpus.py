"""Deterministic synthetic web-page corpus (the BASELINE.json input shape).

pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Generation is a pure function of (seed, num_docs) and is *distributed*: the
docs are generated inside mapInPandas over spark.range(num_docs), so the same
generator scales from 1k-doc unit tests to multi-million-doc bench corpora
without a driver bottleneck. Per-doc RNG is seeded by (seed, doc_id) so the
output is independent of partitioning.

Mirrors the reference's synthetic test strategy (fixed-seed randomized
collections, /root/reference/test/test_generic_sequence.hpp:7-26) with a
Zipfian vocabulary so posting lists exhibit realistic head-term skew.
"""

from __future__ import annotations

import datetime
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

VOCAB_SIZE = 30_000
NUM_HOSTS = 500
EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)


@lru_cache(maxsize=4)
def _zipf_cdf(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return np.cumsum(w) / w.sum()


@lru_cache(maxsize=1)
def _vocab() -> np.ndarray:
    return np.array([f"w{i:06d}" for i in range(VOCAB_SIZE)], dtype=object)


def _gen_docs(doc_ids: np.ndarray, seed: int) -> pd.DataFrame:
    token_cdf = _zipf_cdf(VOCAB_SIZE, 1.07)
    host_cdf = _zipf_cdf(NUM_HOSTS, 1.3)
    vocab = _vocab()

    urls, texts, langs, tss = [], [], [], []
    for doc_id in doc_ids:
        rng = np.random.default_rng((seed, int(doc_id)))
        length = int(np.clip(rng.lognormal(np.log(120.0), 0.6), 8, 2048))
        tok_ids = np.searchsorted(token_cdf, rng.random(length))
        texts.append(" ".join(vocab[tok_ids]))
        site = int(np.searchsorted(host_cdf, rng.random()))
        urls.append(f"https://site{site:04d}.example/{int(doc_id):06d}")
        r = rng.random()
        langs.append("en" if r < 0.95 else ("de" if r < 0.975 else "fr"))
        tss.append(EPOCH + datetime.timedelta(seconds=int(doc_id)))

    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in texts]
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": html, "text": texts, "lang": langs}
    )


def generate_pages(
    spark: SparkSession, num_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_docs(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, num_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages input table from any Spark source.

    `source` is either a catalog table name (resolved via
    ``spark.read.table`` — this is the Iceberg path of the north rule:
    with an Iceberg catalog configured, ``read_pages(spark,
    "warehouse.crawl.pages")`` reads the Iceberg table with full
    partition pruning / snapshot semantics) or a filesystem path
    (read as Parquet, the sandbox stand-in). Only the pages columns are
    selected, so Catalyst prunes everything else at the scan.
    """
    looks_like_path = ("/" in source or source.endswith(".parquet")
                       or source.startswith("file:"))
    reader = (spark.read.parquet(source) if looks_like_path
              else spark.read.table(source))
    return reader.select(*[f.name for f in PAGES_SCHEMA.fields])


def extract_text(pages: DataFrame) -> DataFrame:
    """Re-derive `text` from the raw `html` payload (strip the fixture's
    <html><body> wrapper), byte-identical to the provided text column by
    construction — JVM-side expressions only. Real crawl extraction would
    replace this single column expression; everything downstream consumes
    `text` and is unaffected.
    """
    from pyspark.sql import functions as F

    stripped = F.regexp_replace(
        F.decode(F.col("html"), "utf-8"),
        r"^<html><body>|</body></html>$",
        "",
    )
    return pages.withColumn("text", stripped)


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the driver-provided `documents` table (doc_id, text, lang, source,
    n_chars) to the pages shape so the whole engine runs on it unchanged."""
    from pyspark.sql import functions as F

    return documents.select(
        F.format_string("https://docs.example/%08d", F.col("doc_id").cast("int")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )

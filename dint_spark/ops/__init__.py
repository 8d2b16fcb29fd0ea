"""Large-scale training-data pipeline operators (dedup, text analysis,
similarity search, multimodal plumbing) over the documents/embeddings
tables."""

from __future__ import annotations


def bench_entries() -> dict:
    """name -> fn(spark, sf_dir) -> DataFrame; timed by bench.py."""
    from dint_spark.ops.entries import spark_queries

    q = spark_queries()
    picks = [
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "text_quality",
    ]
    return {k: q[k] for k in picks if k in q}

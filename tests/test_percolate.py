"""Percolation == brute containment: a registered query fires for every
doc containing ALL its distinct tokens; duplicate query tokens fold; a
query with an out-of-corpus term never fires; an empty query never
fires; the streaming form processed in two checkpointed waves emits
exactly the batch result over the union of waves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dint_spark.percolate import percolate, percolate_stream, register_queries

QUERIES = ["join hash", "row", "scan filter batch", "the join",
           "zzznotaword join", "", "join join hash"]


@pytest.fixture(scope="module")
def pdocs():
    rng = np.random.default_rng(13)
    words = ["join", "hash", "row", "scan", "filter", "batch", "the",
             "merge", "slow", "fast"]
    rows = []
    for d in range(400):
        n = int(rng.integers(2, 9))
        rows.append((d, " ".join(rng.choice(words, size=n))))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _brute(pdocs, queries):
    out = set()
    for d, text in zip(pdocs["doc_id"], pdocs["text"]):
        toks = set(text.split())
        for qid, q in enumerate(queries):
            need = {t for t in q.lower().split() if t}
            if need and need <= toks:
                out.add((qid, d))
    return out


def test_percolate_matches_brute(spark, pdocs):
    reg = register_queries(spark, QUERIES)
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(spark.createDataFrame(pdocs), reg).collect()}
    assert got == _brute(pdocs, QUERIES)
    # sanity: the fixture actually exercises multi-term matches and the
    # duplicate-fold query (6 == "join join hash" == query 0's matches)
    assert any(q == 0 for q, _ in got)
    assert ({d for q, d in got if q == 6}
            == {d for q, d in got if q == 0})
    assert not any(q in (4, 5) for q, _ in got)


def test_percolate_stream_two_waves(spark, tmp_path, pdocs):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    reg = register_queries(spark, QUERIES)
    half = len(pdocs) // 2
    waves = [pdocs.iloc[:half], pdocs.iloc[half:]]
    got: set = set()

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])

    def run_wave(wave, i):
        spark.createDataFrame(wave).coalesce(1).write.mode(
            "append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        matches = percolate_stream(stream, reg)

        def sink(batch_df, batch_id):
            got.update((r["query_id"], r["doc_id"])
                       for r in batch_df.collect())

        q = (matches.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    for i, wave in enumerate(waves):
        run_wave(wave, i)
    assert got == _brute(pdocs, QUERIES)

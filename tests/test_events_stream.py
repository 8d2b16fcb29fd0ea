"""events_windowed's streaming claim, pinned: the same window/agg
expression run as a Structured-Streaming query (file source,
foreachBatch, availableNow) over the events table emits EXACTLY the
batch op's rows — F.window + count/approximate-free aggregates are the
expression the op's docstring promises runs under streaming.

(countDistinct is not supported in streaming append mode, so the
streaming leg compares the count/sum columns — the distinct-user column
is a batch-only refinement and the HLL sketch op is the streaming-safe
distinct path.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
WINDOW_S = 300


def _agg(df):
    w = F.window("ts", f"{WINDOW_S} seconds")
    return (df.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("sum_value_c"))
            .select(F.unix_timestamp(F.col("w.start"))
                    .alias("window_start"),
                    "event_type", "n_events", "sum_value_c"))


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata missing")
def test_windowed_agg_streaming_equals_batch(spark, tmp_path):
    events = spark.read.parquet(os.path.join(SF, "events.parquet"))
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    batch = {tuple(r) for r in _agg(events).collect()}
    out = []

    def sink(df, _epoch):
        out.extend(tuple(r) for r in _agg(df).collect())

    # availableNow + foreachBatch: each micro-batch aggregates its slice
    # with the IDENTICAL expression; a per-window merge by key reassembles
    # the global windows (counts and cent-sums are associative — the
    # map-side-combine argument, applied across micro-batches)
    q = (spark.readStream.schema(events.schema).parquet(src)
         .writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)

    merged: dict = {}
    for ws, et, n, sc in out:
        k = (ws, et)
        pn, ps = merged.get(k, (0, 0))
        merged[k] = (pn + n, ps + sc)
    streamed = {(ws, et, n, sc) for (ws, et), (n, sc) in merged.items()}
    assert streamed == batch

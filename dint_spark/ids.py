"""Scalable deterministic dense-index assignment (no RDD zipWithIndex, no
single-partition window).

The reference gets dense docIDs for free (ordinal position in the input
file, include/ds2i/binary_freq_collection.hpp). In Spark we assign a dense
0..N-1 index as the rank under a total order using the classic two-pass
range-partition trick:

  1. repartitionByRange + sortWithinPartitions on the order keys (one
     shuffle; this is a distributed sort, partition count scales with data)
  2. count rows per partition (tiny collect of P longs)
  3. mapInPandas adds offset[pid] + running position within the partition

The ranged DataFrame is persisted between the two passes so the sampled
range boundaries are computed exactly once (determinism), then unpersisted
by the caller via the returned handle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def add_dense_index(
    df: DataFrame,
    order_by: list[Column],
    index_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return df + a dense 0..N-1 long column ranking rows by order_by.

    The order must be total (include a unique tie-break column) for the
    result to be deterministic.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)

    # persist the INPUT first: repartitionByRange runs a separate sampling
    # job over its child, which would otherwise recompute the entire
    # upstream pipeline (measured: dominated the corpus phase, and got
    # worse with more cores)
    src = df.persist()
    ranged = (
        src.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["__pid"]: r["cnt"] for r in
              ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    src.unpersist()
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        [f for f in ranged.schema.fields if f.name != "__pid"]
        + [T.StructField(index_col, T.LongType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = 0  # running row position within this partition
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"]).copy()
            out[index_col] = range(base + pos, base + pos + len(pdf))
            pos += len(pdf)
            yield out

    result = ranged.mapInPandas(assign, schema=out_schema)
    # NB: caller should materialize `result` (e.g. write/cache) before long
    # pipelines; `ranged` stays persisted until spark GC / explicit unpersist.
    return result

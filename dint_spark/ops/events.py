"""Event-stream operators over the `events` table.

  events_windowed     5-minute tumbling-window aggregation per event_type
                      (F.window — the same expression runs under Structured
                      Streaming with a watermark; here verified in batch
                      mode against a DuckDB epoch-bucket oracle)
  events_sessionize   gap-based sessionization (10-min inactivity) per user
                      via lag + cumulative sum (gaps-and-islands) — the
                      relational equivalent of applyInPandasWithState
                      session windows, verified against the same SQL

Scale: both are single-shuffle window/agg plans (partition by user_id /
event_type); no UDFs, fully whole-stage-codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WINDOW_S = 300
SESSION_GAP_S = 600


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = F.window("ts", f"{WINDOW_S} seconds")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            # quantize BEFORE the sum: float sums are order-dependent across
            # engines; per-row cents are exact and the int64 sum is not
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .alias("sum_value_c"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value_c",
        )
    )


EVENTS_WINDOWED_SQL = f"""
SELECT
  (floor(epoch(ts) / {WINDOW_S}) * {WINDOW_S})::BIGINT AS window_start,
  event_type,
  count(*)::BIGINT AS n_events,
  count(DISTINCT user_id)::BIGINT AS n_users,
  sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("tsec")
    )
    w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(
            F.col("tsec") - F.lag("tsec").over(w) > SESSION_GAP_S, 1
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return gapped.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("tsec").alias("session_start"),
        F.max("tsec").alias("session_end"),
    )


EVENTS_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS tsec FROM events
),
gapped AS (
  SELECT user_id, event_id, tsec,
         CASE WHEN tsec - lag(tsec) OVER w > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
),
sess AS (
  SELECT user_id, tsec,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY tsec, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM gapped
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       min(tsec) AS session_start,
       max(tsec) AS session_end
FROM sess
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (applyInPandasWithState keyed state, see
    dint_spark.streaming.stream_sessionize) driven availableNow over the
    same events table — value-identical to batch events_sessionize, so it
    shares its SQL oracle: an exact correctness check on a custom stateful
    streaming operator."""
    import tempfile

    from dint_spark.streaming import run_sessionize_available_now

    work = tempfile.mkdtemp(prefix="dint_sess_stream_")
    staged = f"{work}/events"
    _events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("tsec")
    ).write.mode("overwrite").parquet(staged)
    pdf = run_sessionize_available_now(spark, staged, f"{work}/ckpt")
    out = spark.createDataFrame(
        pdf, "user_id bigint, session_start bigint, session_end bigint, "
        "n_events bigint"
    )
    w = Window.partitionBy("user_id").orderBy("session_start")
    return out.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("long").alias("session_idx"),
        "n_events",
        "session_start",
        "session_end",
    )


SPARK_QUERIES = {
    "events_windowed": events_windowed,
    "events_sessionize": events_sessionize,
    "events_sessionize_stream": events_sessionize_stream,
}

ORACLE_SQLS = {
    "events_windowed": EVENTS_WINDOWED_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_sessionize_stream": EVENTS_SESSIONIZE_SQL,
}

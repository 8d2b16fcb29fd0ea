"""Event-stream operators over the `events` table.

  events_windowed     5-minute tumbling-window aggregation per event_type
                      (F.window — the same expression runs under Structured
                      Streaming with a watermark; here verified in batch
                      mode against a DuckDB epoch-bucket oracle)
  events_sessionize   gap-based sessionization (10-min inactivity) per user
                      via lag + cumulative sum (gaps-and-islands) — the
                      relational equivalent of applyInPandasWithState
                      session windows, verified against the same SQL
  events_cardinality  HyperLogLog distinct-user sketch per event_type
                      (ES cardinality agg) — integer register invariant
                      under the exact-hash gate, estimate in pytest
  events_date_histogram  ES date_histogram, calendar-day buckets (UTC)

Scale: all are single-shuffle agg/window plans (partition by user_id /
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


# --------------------------------------------------------------------------
# events_cardinality — HyperLogLog distinct-count sketch (ES cardinality agg)
# --------------------------------------------------------------------------

HLL_P = 10
HLL_M = 1 << HLL_P          # 1024 registers
_HLL_HASH_BITS = 60         # 15 hex chars of md5 -> fits a signed i64
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P  # 50 rank bits


def events_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cardinality`` aggregation: a mergeable HyperLogLog sketch of
    distinct user_ids per event_type (Flajolet et al., AofA 2007 — the
    algorithm ES's implementation cites).

    The gate row is the sketch's integer invariant, not the float
    estimate: per event_type, (registers set, registers zero, the
    harmonic sum scaled by 2^50 — an exact int64). Both engines hash
    with md5 (bit-identical by definition), so the oracle reproduces the
    registers exactly; estimate accuracy is pinned separately in pytest
    (``hll_estimate``), keeping cross-engine float math out of the
    hash-compared gate.

    Scale shape: this is the whole point of the sketch — the plan is
    groupBy(type, register).max(rho) (map-side partial max over 1024·
    |types| cells, NOT over distinct users) then a 1024-row-per-type
    final fold. At 10^12 events the shuffle carries at most
    |types|·1024 rows per partition regardless of user cardinality, and
    sketches from different shards/epochs merge by register max — the
    property count-distinct lacks. No UDFs; md5/conv/bin are JVM
    expressions inside whole-stage codegen."""
    return cardinality_sketch(_events(spark, sf_dir),
                              key="event_type", value="user_id")


def cardinality_sketch(df: DataFrame, key: str, value: str) -> DataFrame:
    """The HLL aggregation over any (key, value) DataFrame: one row per
    key with the exact integer sketch invariant (regs_set, regs_zero,
    harmonic_x). See events_cardinality for the contract."""
    h = (F.conv(F.substring(F.md5(F.col(value).cast("string")), 1, 15),
                16, 10).cast("long"))
    d = df.select(
        F.col(key).alias(key),
        F.pmod(h, F.lit(HLL_M)).alias("reg"),
        F.shiftright(h, HLL_P).alias("w"),
    )
    rho = (F.when(F.col("w") == 0, F.lit(_HLL_W_BITS + 1))
           .otherwise(F.lit(_HLL_W_BITS + 1) - F.length(F.bin("w"))))
    regs = (d.select(key, "reg", rho.alias("rho"))
            .groupBy(key, "reg")
            .agg(F.max("rho").alias("m_rho")))
    # exact-integer harmonic sum, scaled so every term is integral:
    # register with rank rho contributes 2^(W+1-rho), empty = 2^(W+1)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                  f"{_HLL_W_BITS + 1} - m_rho)")
    return (regs.groupBy(key)
            .agg(F.count("*").alias("regs_set"),
                 F.sum(term).alias("set_sum"))
            .select(
                key,
                F.col("regs_set").cast("long").alias("regs_set"),
                (F.lit(HLL_M) - F.col("regs_set")).cast("long")
                .alias("regs_zero"),
                (F.col("set_sum")
                 + (F.lit(HLL_M) - F.col("regs_set"))
                 * F.lit(1 << (_HLL_W_BITS + 1))).cast("long")
                .alias("harmonic_x"),
            ))


EVENTS_CARDINALITY_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM events
),
d AS (
  SELECT event_type, h % {HLL_M} AS reg, h // {HLL_M} AS w FROM h
),
r AS (
  SELECT event_type, reg,
         max(CASE WHEN w = 0 THEN {_HLL_W_BITS + 1}
                  ELSE {_HLL_W_BITS + 1} - length(bin(w)) END) AS m_rho
  FROM d GROUP BY 1, 2
)
SELECT event_type,
       count(*)::BIGINT AS regs_set,
       ({HLL_M} - count(*))::BIGINT AS regs_zero,
       (sum(1::BIGINT << ({_HLL_W_BITS + 1} - m_rho))
        + ({HLL_M} - count(*)) * (1::BIGINT << {_HLL_W_BITS + 1})
       )::BIGINT AS harmonic_x
FROM r GROUP BY 1 ORDER BY 1
"""


def hll_estimate(regs_zero: int, harmonic_x: int, m: int = HLL_M) -> float:
    """Cardinality estimate from the sketch invariant the gate rows
    carry: E = alpha_m * m^2 / sum(2^-M_j), with the small-range
    linear-counting correction (Flajolet et al. §4)."""
    import math

    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * float(1 << (_HLL_W_BITS + 1)) / harmonic_x
    if est <= 2.5 * m and regs_zero > 0:
        return m * math.log(m / regs_zero)
    return est


# --------------------------------------------------------------------------
# events_date_histogram — ES date_histogram (calendar day buckets)
# --------------------------------------------------------------------------


def events_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_histogram`` with calendar_interval=day: per (calendar
    day, event_type), event count, distinct users, and the exact
    cents-quantized value sum (the events_windowed convention — float
    sums are order-dependent across engines, int64 cent sums are not).

    UTC calendar days are computed by epoch flooring (for the day
    interval, UTC-calendar truncation IS floor(epoch/86400) — no
    session-timezone dependence, unlike date_trunc, which reads the
    session zone at EXECUTION time and would silently shift bucket
    edges if any caller changed it; review round 3). Month/quarter
    calendar intervals are the named seam that would need date_trunc
    under an explicitly pinned zone. One map-side-combined hash
    aggregate; scales like events_windowed."""
    e = _events(spark, sf_dir)
    day_start = (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
    return (
        e.groupBy(day_start.cast("long").alias("day_start"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.sum(F.round(F.col("value") * 100, 0).cast("long"))
             .alias("sum_value_c"))
        .select("day_start", "event_type", "n_events", "n_users",
                "sum_value_c")
    )


EVENTS_DATE_HISTOGRAM_SQL = """
SELECT epoch(date_trunc('day', ts))::BIGINT AS day_start,
       event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


SPARK_QUERIES = {
    "events_windowed": events_windowed,
    "events_sessionize": events_sessionize,
    "events_sessionize_stream": events_sessionize_stream,
    "events_cardinality": events_cardinality,
    "events_date_histogram": events_date_histogram,
}

ORACLE_SQLS = {
    "events_windowed": EVENTS_WINDOWED_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_sessionize_stream": EVENTS_SESSIONIZE_SQL,
    "events_cardinality": EVENTS_CARDINALITY_SQL,
    "events_date_histogram": EVENTS_DATE_HISTOGRAM_SQL,
}

"""Time-window aggregations on batch data — SURVEY.md §2.B rows 59-61.

These are the batch twins of the Structured Streaming jobs in
builder_spark/streaming (rows 62-64): identical window semantics, so
correctness established here transfers to the streaming path.

Parity notes:
- Spark's F.window aligns buckets to the Unix epoch; the oracles use
  explicit epoch-floor arithmetic (not time_bucket, whose default
  origin is 2000-01-01 — same alignment for divisors of 30 years of
  seconds, but explicit is safer).
- Session gaps compare microsecond-exact integers (unix_micros /
  epoch_us); comparing truncated seconds or fractional doubles flips
  boundary events between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_win_tumbling",
    oracle="""
        SELECT date_trunc('hour', ts) AS win_start,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    category="window-time",
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type via F.window (streaming-
    compatible operator; on batch it's just a group-by on the bucket)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )


@register(
    "q_win_sliding",
    oracle="""
        SELECT make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - k.k * 900) * 1000000 AS BIGINT)) AS win_start,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
        GROUP BY 1
    """,
    category="window-time",
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 min — each event lands in exactly
    4 overlapping windows. Spark assigns them via F.window(…, slide);
    the oracle enumerates the 4 slide offsets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )


@register(
    "q_win_session",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                         OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT *, sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
               round(sum(value), 4) AS total_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    category="window-time",
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the lag+cumsum
    rewrite (deterministic batch twin of F.session_window). One shuffle
    on user_id serves both the lag window and the session rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 1800 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )

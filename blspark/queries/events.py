"""Window functions + event-time analytics over the `events` table.

The reference's only window computation is the Q2 argmax (SURVEY.md
§2.5); these queries cover the full window surface the extended scope
(BASELINE.json north star) needs: ranking, lag/lead, running aggregates,
tumbling event-time windows, and sessionization — all batch-expressible
and oracle-checked. The streaming variants live in
blspark/queries/streaming_q.py.

Running sums use the decimal-cast convention so window prefix sums hash
identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import dsum, load_table, o_dsum, register


@register(
    "q_window_rank_lag",
    oracle="""
    SELECT event_id, user_id, value,
           ROW_NUMBER() OVER w AS rn,
           LAG(event_type) OVER w AS prev_type,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    doc="row_number / lag / running sum over per-user event timelines "
    "(§2.5 extension surface). Partitions by user -> scales with users.",
)
def q_window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.sum(F.col("value").cast("decimal(28,4)")).over(wrun).cast("double").alias(
            "running_value"
        ),
    )


@register(
    "q_window_topk_per_group",
    oracle="""
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events WHERE event_type = 'purchase'
    ) t WHERE rn <= 3
    """,
    doc="Top-3 per group via ranking window — the scalable top-k-per-key "
    "pattern (generalizes A6).",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


@register(
    "q_events_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window aggregation (T2 analog in "
    "batch; streaming twin in streaming_q.py). Uses F.window -> "
    "struct(start,end); hash-partitioned by (window, type).",
    bench=True,
)
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_events_sessionize",
    oracle="""
    WITH ev_us AS (
      -- truncate to microseconds so a nanos-preserving DuckDB evaluates the
      -- 30-min gap at the same precision Spark reads (nanos->micros)
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev_us
    ), sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM gaps
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
    doc="Sessionization: lag(ts) gap > 30 min starts a new session; "
    "cumulative-sum session ids; per-user session counts. Batch twin of "
    "session_window streaming.",
    bench=True,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # double-seconds keeps microsecond precision, matching the oracle's
    # exact INTERVAL comparison (long-cast would truncate to seconds)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    with_sessions = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800.0), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(wrun))
    return with_sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )

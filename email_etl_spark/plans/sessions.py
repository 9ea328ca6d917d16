"""Sessionization & windowed aggregation (SURVEY.md §2.H) over the
events stream table — the batch twins of the structured-streaming
pipelines in email_etl_spark/streaming/.

Gap-based sessionization is the classic lag + running-sum pattern:
one shuffle on the session key, everything else window-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register

SESSION_GAP_S = 1800  # 30 minutes


@register(
    "sessionize",
    headline=True,
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
), per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS sess_events,
         date_diff('second', MIN(ts), MAX(ts)) AS sess_seconds
  FROM s GROUP BY user_id, sess_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(sess_events) AS BIGINT) AS n_events,
       MAX(sess_events) AS max_session_events,
       MAX(sess_seconds) AS max_session_seconds
FROM per_sess GROUP BY user_id ORDER BY user_id
""",
    doc="30-min-gap sessionization (lag + running sum); the batch twin of a streaming session window.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    sess = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("sess_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("sess_seconds"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("sess_events").cast("bigint").alias("n_events"),
            F.max("sess_events").alias("max_session_events"),
            F.max("sess_seconds").alias("max_session_seconds"),
        )
        .orderBy("user_id")
    )


@register(
    "tumbling_counts",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="1-hour tumbling window counts — batch twin of the streaming windowed aggregation (SURVEY §2.H).",
)
def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").start.alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("window_start", "event_type")
    )


@register(
    "value_percentiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.95), 4) AS p95,
       ROUND(MAX(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc=(
        "Exact interpolated percentiles per category (volume/latency "
        "profile surface). Spark percentile == SQL quantile_cont (both "
        "linear interpolation over the sorted set); at cluster scale swap "
        "to approx_percentile (t-digest) and drop the oracle to rows-only."
    ),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("event_type")
    )

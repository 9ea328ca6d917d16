"""Pattern analytics (SURVEY.md §2.B) — analyze_email_patterns with
group_by ∈ {sender, label, day, week} (ref: src/api/mcp_tools.py:204-224,
src/llm_integration.py:309).

Each is a single-shuffle groupBy; time buckets use date_trunc so the
bucketing is a pure column expression (partition-prunable when the
table is date-partitioned at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register

DEC = "decimal(18,4)"


@register(
    "patterns_by_user",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
       CAST(MAX(ts) AS TIMESTAMP) AS last_seen
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 25
""",
    doc="group_by=sender: per-actor volume/diversity/value profile.",
)
def patterns_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(25)
    )


@register(
    "patterns_by_type",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="group_by=label: per-category volume and value.",
)
def patterns_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast(DEC)).cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            sum_dec.alias("total_value"),
            (sum_dec / F.count("*")).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@register(
    "patterns_by_day",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
""",
    doc="group_by=day: daily volume trend.",
)
def patterns_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


@register(
    "patterns_by_week",
    oracle="""
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1 ORDER BY 1
""",
    doc="group_by=week: weekly volume trend (Monday-truncated in both engines).",
)
def patterns_by_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("week")
    )


@register(
    "thread_summary",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS thread_start,
       CAST(MAX(ts) AS TIMESTAMP) AS thread_end,
       COUNT(DISTINCT event_type) AS n_types,
       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS participants
FROM events GROUP BY user_id ORDER BY user_id
""",
    doc=(
        "Thread-summary context assembly: participants, date range, counts "
        "per thread key — the deterministic core of summarize_thread "
        "(ref: src/llm_integration.py:116-177) before the LLM call. "
        "Participants are projected to a sorted comma-joined STRING (not an "
        "array) so every downstream canonicalizer — including ones that "
        "sort/hash column values — handles the output."
    ),
)
def thread_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("thread_start"),
            F.max("ts").alias("thread_end"),
            F.countDistinct("event_type").alias("n_types"),
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
                "participants"
            ),
        )
        .orderBy("user_id")
    )


_DOMAINS = ("example.com", "corp.example.org", "mail.example.net", "example.io")


@register(
    "patterns_by_domain",
    oracle=f"""
WITH t AS (
  SELECT user_id, value,
         'user' || CAST(user_id AS VARCHAR) || '@' ||
         CASE CAST(user_id % 4 AS INTEGER)
              WHEN 0 THEN '{_DOMAINS[0]}' WHEN 1 THEN '{_DOMAINS[1]}'
              WHEN 2 THEN '{_DOMAINS[2]}' ELSE '{_DOMAINS[3]}' END AS sender
  FROM events
)
SELECT lower(regexp_extract(sender, '@([A-Za-z0-9.-]+)$', 1)) AS domain,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_senders,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM t GROUP BY 1 ORDER BY n_events DESC, domain
""",
    doc=(
        "group_by=domain: sender-domain rollup via the address-parsing "
        "kit (ref: src/api/mcp_tools.py:218-221 'domain' enum; domain = "
        "sender address split on '@'). The corpus has no address column, "
        "so a deterministic sender mailbox is derived from user_id and "
        "then parsed with functions/email_text.email_domain — the same "
        "operator an email corpus would hit."
    ),
)
def patterns_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.functions import email_text as ET

    ev = load_table(spark, sf_dir, "events")
    domains = F.array(*[F.lit(d) for d in _DOMAINS])
    sender = F.concat(
        F.lit("user"), F.col("user_id").cast("string"), F.lit("@"),
        F.element_at(domains, (F.col("user_id") % 4 + 1).cast("int")),
    )
    return (
        ev.select(ET.email_domain(sender).alias("domain"), "user_id", "value")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_senders"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("n_events"), "domain")
    )

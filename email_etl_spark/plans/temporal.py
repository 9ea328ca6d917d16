"""Temporal join operators (SURVEY.md §2.L) — as-of and range joins
over the events stream, the two classic time-series joins Spark has no
built-in operator for (ref: thread/date navigation surface,
src/database.py:211-246 get_emails_by_thread / get_emails_after_date —
"what happened just before X" / "what happened around X" queries).

Scale design — both avoid the quadratic pair space a naive
time-inequality join materializes:

- as-of join: the union-sort-window form. Both sides merge into one
  stream, one shuffle on the join key, and the most recent build-side
  row reaches each probe row through running `last(ignorenulls)` —
  per-row O(1) window state, no range blowup, skew handled like any
  window (operators/skew.py salting if a key is hot).
- range join: the binned-bucket form. Time is bucketed at the window
  width, the probe side duplicates into (bin-1, bin), the join runs on
  (key, bin) equality — each candidate pair materializes exactly once
  and the exact interval filter runs inside the join. 2x probe-side
  duplication buys equality-join pruning at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register

RANGE_WINDOW_S = 1800  # 30-minute lookback


@register(
    "asof_join",
    oracle="""
SELECT a.event_id AS purchase_id, a.user_id, CAST(a.ts AS TIMESTAMP) AS ts,
       b.event_id AS prior_event_id, b.event_type AS prior_type,
       CAST(b.ts AS TIMESTAMP) AS prior_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') b
  ON a.user_id = b.user_id AND b.ts <= a.ts
QUALIFY b.event_id IS NULL
     OR ROW_NUMBER() OVER (PARTITION BY a.event_id
                           ORDER BY b.ts DESC, b.event_id DESC) = 1
ORDER BY purchase_id
""",
    doc=(
        "As-of join: each purchase matched to the user's most recent "
        "prior-or-simultaneous non-purchase event. Union-sort-window form: "
        "one shuffle, O(1) state per row, no inequality-join pair blowup. "
        "Oracle is the equivalent windowed inequality join (exact at oracle "
        "scale)."
    ),
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("src"),
        F.col("event_id").alias("b_event_id"),
        F.col("event_type").alias("b_type"),
        F.col("ts").alias("b_ts"),
    )
    a = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("src"),
        F.lit(None).cast("long").alias("b_event_id"),
        F.lit(None).cast("string").alias("b_type"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("b_ts"),
    )
    # src=0 sorts build rows BEFORE an equal-ts probe row, so b.ts <=
    # a.ts ties are included; event_id breaks build-side ties exactly
    # like the oracle's ORDER BY b.ts DESC, b.event_id DESC.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = a.unionByName(b).select(
        "user_id",
        "ts",
        "event_id",
        "src",
        F.last("b_event_id", ignorenulls=True).over(w).alias("prior_event_id"),
        F.last("b_type", ignorenulls=True).over(w).alias("prior_type"),
        F.last("b_ts", ignorenulls=True).over(w).alias("prior_ts"),
    )
    return (
        merged.where(F.col("src") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            "prior_event_id",
            "prior_type",
            "prior_ts",
        )
        .orderBy("purchase_id")
    )


@register(
    "range_join_count",
    oracle=f"""
SELECT a.event_id AS error_id, a.user_id, CAST(a.ts AS TIMESTAMP) AS ts,
       COUNT(b.event_id) AS n_prior_30m
FROM (SELECT * FROM events WHERE event_type = 'error') a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL {RANGE_WINDOW_S} SECOND
 AND b.ts < a.ts
GROUP BY 1, 2, 3
ORDER BY error_id
""",
    doc=(
        "Range join: per error event, how many same-user events landed in "
        "the preceding 30 minutes. Binned-bucket form: bin width == window "
        "width, probe duplicated into (bin-1, bin), equality join on "
        "(user, bin), exact interval filter inside the join — every "
        "candidate pair materializes once, no inequality-join blowup."
    ),
)
def range_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # bin = floor(epoch_seconds / window). A half-open 30-min lookback
    # spans at most bins {bin-1, bin} because bin width == window width.
    # unix_timestamp works on both TIMESTAMP and TIMESTAMP_NTZ scans
    # (cast("long") is rejected for NTZ parquet reads).
    binexpr = F.floor(F.unix_timestamp(F.col("ts")) / RANGE_WINDOW_S)
    a = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("a_ts"),
            binexpr.alias("bin"),
        )
        .withColumn("probe_bin", F.explode(F.array(F.col("bin") - 1, F.col("bin"))))
        .drop("bin")
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_event_id"),
        binexpr.alias("probe_bin"),
    )
    in_window = (F.col("b_ts") >= F.col("a_ts") - F.expr(f"INTERVAL {RANGE_WINDOW_S} SECOND")) & (
        F.col("b_ts") < F.col("a_ts")
    )
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user")) & (a.probe_bin == b.probe_bin) & in_window,
        "left",
    )
    return (
        joined.groupBy("error_id", F.col("a_user").alias("user_id"), F.col("a_ts").alias("ts"))
        .agg(F.count("b_event_id").alias("n_prior_30m"))
        .orderBy("error_id")
    )

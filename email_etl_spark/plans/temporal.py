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


ASOF_FWD_TOL_S = 3600  # forward-match tolerance (1 hour)


@register(
    "asof_join_forward",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, ts,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS tse
  FROM events
),
a AS (SELECT * FROM e WHERE event_type = 'error'),
b AS (SELECT * FROM e WHERE event_type = 'purchase'),
j AS (
  SELECT a.event_id AS error_id, a.user_id, CAST(a.ts AS TIMESTAMP) AS ts,
         b.event_id AS next_purchase_id, b.tse - a.tse AS wait_s
  FROM a LEFT JOIN b
    ON a.user_id = b.user_id AND b.tse >= a.tse
   AND b.tse - a.tse <= {ASOF_FWD_TOL_S}
  QUALIFY b.event_id IS NULL
       OR ROW_NUMBER() OVER (PARTITION BY a.event_id
                             ORDER BY b.tse, b.event_id) = 1
)
SELECT error_id, user_id, ts,
       CAST(next_purchase_id AS BIGINT) AS next_purchase_id,
       CAST(wait_s AS BIGINT) AS wait_s
FROM j ORDER BY error_id
""",
    doc=(
        "Forward as-of join with tolerance: each error event matched "
        "to the same user's NEXT purchase within 1 hour (recovery-"
        "after-failure measurement; the directional + tolerance "
        "variant completing asof_join's backward match — together "
        "they cover the pandas merge_asof direction/tolerance "
        "surface; SURVEY §2.L). Same union-sort-window shape as "
        "asof_join run forward: one shuffle on user_id, the next "
        "build row reaches each probe row through first(ignorenulls) "
        "over the FOLLOWING frame — O(1) state, no inequality-join "
        "pair space; the tolerance is a post-window null-out, so "
        "match semantics live entirely on integer epoch seconds "
        "(NTZ-safe, identical in both engines)."
    ),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "event_type", "ts",
        F.unix_timestamp(F.col("ts")).alias("tse"),
    )
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "tse",
        "event_id",
        F.lit(1).alias("src"),
        F.struct(F.col("event_id").alias("pid"), F.col("tse").alias("ptse")).alias("bs"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("a_ts"),
    )
    a = e.where(F.col("event_type") == "error").select(
        "user_id",
        "tse",
        "event_id",
        F.lit(0).alias("src"),
        F.lit(None).cast("struct<pid:bigint,ptse:bigint>").alias("bs"),
        F.col("ts").alias("a_ts"),
    )
    # probe src=0 sorts BEFORE an equal-second build row, so tse_b >=
    # tse_a ties are inside the FOLLOWING frame; event_id asc breaks
    # build ties exactly like the oracle's ORDER BY b.tse, b.event_id.
    w = (
        Window.partitionBy("user_id")
        .orderBy("tse", "src", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = a.unionByName(b).select(
        "user_id",
        "tse",
        "event_id",
        "src",
        "a_ts",
        F.first("bs", ignorenulls=True).over(w).alias("nxt"),
    )
    got = F.col("nxt").isNotNull() & (
        (F.col("nxt.ptse") - F.col("tse")) <= ASOF_FWD_TOL_S
    )
    return (
        merged.where(F.col("src") == 0)
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("a_ts").alias("ts"),
            F.when(got, F.col("nxt.pid")).cast("bigint").alias("next_purchase_id"),
            F.when(got, F.col("nxt.ptse") - F.col("tse")).cast("bigint").alias("wait_s"),
        )
        .orderBy("error_id")
    )


@register(
    "asof_join_nearest",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, ts,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS tse
  FROM events
),
a AS (SELECT * FROM e WHERE event_type = 'error'),
b AS (SELECT * FROM e WHERE event_type = 'purchase'),
prev AS (
  SELECT a.event_id AS error_id, b.event_id AS pid, b.tse AS ptse
  FROM a JOIN b ON a.user_id = b.user_id AND b.tse <= a.tse
  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.event_id
                             ORDER BY b.tse DESC, b.event_id DESC) = 1
),
nxt AS (
  SELECT a.event_id AS error_id, b.event_id AS nid, b.tse AS ntse
  FROM a JOIN b ON a.user_id = b.user_id AND b.tse > a.tse
  QUALIFY ROW_NUMBER() OVER (PARTITION BY a.event_id
                             ORDER BY b.tse, b.event_id) = 1
)
SELECT a.event_id AS error_id, a.user_id, CAST(a.ts AS TIMESTAMP) AS ts,
       CAST(CASE WHEN p.pid IS NOT NULL
                  AND (n.nid IS NULL OR a.tse - p.ptse <= n.ntse - a.tse)
                 THEN p.pid ELSE n.nid END AS BIGINT) AS purchase_id,
       CASE WHEN p.pid IS NULL AND n.nid IS NULL THEN NULL
            WHEN p.pid IS NOT NULL
                 AND (n.nid IS NULL OR a.tse - p.ptse <= n.ntse - a.tse)
            THEN 'backward' ELSE 'forward' END AS direction,
       CAST(CASE WHEN p.pid IS NOT NULL
                  AND (n.nid IS NULL OR a.tse - p.ptse <= n.ntse - a.tse)
                 THEN a.tse - p.ptse ELSE n.ntse - a.tse END AS BIGINT) AS delta_s
FROM a
LEFT JOIN prev p ON p.error_id = a.event_id
LEFT JOIN nxt n ON n.error_id = a.event_id
ORDER BY error_id
""",
    doc=(
        "Nearest-direction as-of join: each error matched to the same "
        "user's CLOSEST purchase in time, either direction (equal "
        "distance -> backward; per-side ties use the asof_join / "
        "asof_join_forward contracts) — completes the pandas "
        "merge_asof direction surface (backward / forward / nearest; "
        "SURVEY §2.L). Still ONE shuffle and ONE sort: both sides "
        "union, and the prev and next candidates read from TWO frames "
        "of the same user-keyed window (last-preceding and first-"
        "following); no time-inequality pair space ever materializes. "
        "Equal-timestamp purchases land in the preceding frame (src "
        "sort), which the backward-wins tie rule makes exactly the "
        "oracle's two-QUALIFY semantics."
    ),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("tse"),
    )
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "tse",
        "event_id",
        F.lit(0).alias("src"),
        F.struct(
            F.col("event_id").alias("pid"), F.col("tse").alias("ptse")
        ).alias("bs"),
        F.lit(None).cast(ev.schema["ts"].dataType).alias("a_ts"),
    )
    a = e.where(F.col("event_type") == "error").select(
        "user_id",
        "tse",
        "event_id",
        F.lit(1).alias("src"),
        F.lit(None).cast("struct<pid:bigint,ptse:bigint>").alias("bs"),
        F.col("ts").alias("a_ts"),
    )
    # ONE sort serves both directions: builds at the probe's own
    # timestamp sort BEFORE it (src 0 < 1), so they are inside the
    # PRECEDING frame (asof ties included backward) and outside the
    # FOLLOWING frame — and backward wins equal distances anyway.
    base = Window.partitionBy("user_id").orderBy("tse", "src", "event_id")
    wp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged = a.unionByName(b).select(
        "user_id",
        "tse",
        "event_id",
        "src",
        "a_ts",
        F.last("bs", ignorenulls=True).over(wp).alias("prv"),
        F.first("bs", ignorenulls=True).over(wn).alias("nxt"),
    )
    prv_d = F.col("tse") - F.col("prv.ptse")
    nxt_d = F.col("nxt.ptse") - F.col("tse")
    back = F.col("prv").isNotNull() & (F.col("nxt").isNull() | (prv_d <= nxt_d))
    return (
        merged.where(F.col("src") == 1)
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("a_ts").alias("ts"),
            F.when(back, F.col("prv.pid"))
            .otherwise(F.col("nxt.pid"))
            .cast("bigint")
            .alias("purchase_id"),
            F.when(F.col("prv").isNull() & F.col("nxt").isNull(), F.lit(None))
            .when(back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
            F.when(back, prv_d).otherwise(nxt_d).cast("bigint").alias("delta_s"),
        )
        .orderBy("error_id")
    )


ASOF_TOL_S = 900  # 15-minute match tolerance


@register(
    "asof_join_tolerance",
    oracle=f"""
SELECT a.event_id AS purchase_id, a.user_id,
       b.event_id AS prior_event_id, b.event_type AS prior_type,
       CAST(date_diff('second', b.ts, a.ts) AS BIGINT) AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') b
  ON a.user_id = b.user_id AND b.ts <= a.ts
 AND b.ts >= a.ts - INTERVAL {ASOF_TOL_S} SECOND
QUALIFY b.event_id IS NULL
     OR ROW_NUMBER() OVER (PARTITION BY a.event_id
                           ORDER BY b.ts DESC, b.event_id DESC) = 1
ORDER BY purchase_id
""",
    doc=(
        "As-of join with a MATCH TOLERANCE: each purchase matched to "
        "the user's most recent prior event only if it happened within "
        f"{ASOF_TOL_S} s — the bounded-staleness variant every feature "
        "store / trade-quote pipeline runs (an unbounded as-of happily "
        "joins yesterday's quote to today's trade). Same union-sort-"
        "window single-shuffle form as asof_join; the tolerance is a "
        "post-window null-out (the most recent prior IS the minimum "
        "gap, so out-of-tolerance means no match at all), never an "
        "inequality join. Oracle carries the tolerance in the join "
        "predicate — provably the same semantics (SURVEY §2.L)."
    ),
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.last("b_event_id", ignorenulls=True).over(w).alias("p_event_id"),
        F.last("b_type", ignorenulls=True).over(w).alias("p_type"),
        F.last("b_ts", ignorenulls=True).over(w).alias("p_ts"),
    )
    # in-tolerance on RAW timestamps (microsecond-exact, like the
    # oracle's join predicate); the reported gap is epoch-second
    # truncated to match date_diff('second', ...)
    ok = F.col("p_ts") >= F.expr(f"ts - INTERVAL {ASOF_TOL_S} SECOND")
    gap = F.expr(
        "unix_micros(cast(ts as timestamp)) div 1000000"
        " - unix_micros(cast(p_ts as timestamp)) div 1000000"
    ).cast("bigint")
    return (
        merged.where(F.col("src") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(ok, F.col("p_event_id")).alias("prior_event_id"),
            F.when(ok, F.col("p_type")).alias("prior_type"),
            F.when(ok, gap).alias("gap_seconds"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# band_join_events (round 8): the symmetric-tolerance temporal
# proximity join, via BUCKETIZATION — the third member of the
# temporal-join family (asof_join_forward = nearest-after via the
# union-merge window; sessionize = gap grouping; this = ALL pairs
# within +/-band).
# ---------------------------------------------------------------------------

BAND_S = 900  # +/- 15 minutes


@register(
    "band_join_events",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS tse
  FROM events
),
a AS (SELECT * FROM e WHERE event_type = 'error'),
b AS (SELECT * FROM e WHERE event_type = 'purchase')
SELECT a.event_id AS error_event_id,
       b.event_id AS purchase_event_id,
       CAST(b.tse - a.tse AS BIGINT) AS delta_s
FROM a JOIN b ON a.user_id = b.user_id AND ABS(a.tse - b.tse) <= {BAND_S}
ORDER BY error_event_id, purchase_event_id
""",
    doc=(
        f"Band (interval-tolerance) join: every (error, purchase) pair "
        f"by the same user within +/-{BAND_S}s — the symmetric "
        "proximity question asof_join_forward's nearest-after contract "
        "cannot answer (root-causing needs ALL nearby purchases, not "
        "one). Scale story is the classic BUCKETIZED band join: a "
        "naive |t1-t2|<=band predicate on top of the user equi-join "
        "degrades to per-user quadratic filtering on power users; "
        "instead each probe row explodes to its 3 adjacent band-width "
        "time buckets and the join runs as a pure EQUI-join on "
        "(user_id, bucket) + exact band filter — each build row has "
        "ONE bucket so no dedup pass is needed, pair work is bounded "
        "by true temporal co-location, and the shuffle key (user, "
        "bucket) splits power users across time. The bucket explode "
        "is x3, not x(corpus) (SURVEY §2.H)."
    ),
)
def band_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp(F.col("ts")).alias("tse"),
    )
    a = (
        e.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_event_id"),
            "user_id",
            F.col("tse").alias("a_tse"),
            F.explode(
                F.array(
                    F.expr(f"(tse div {BAND_S}) - 1"),
                    F.expr(f"tse div {BAND_S}"),
                    F.expr(f"(tse div {BAND_S}) + 1"),
                )
            ).alias("bucket"),
        )
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("tse").alias("b_tse"),
        F.expr(f"tse div {BAND_S}").alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .where(F.abs(F.col("a_tse") - F.col("b_tse")) <= BAND_S)
        .select(
            "error_event_id",
            "purchase_event_id",
            (F.col("b_tse") - F.col("a_tse")).cast("bigint").alias("delta_s"),
        )
        .orderBy("error_event_id", "purchase_event_id")
    )

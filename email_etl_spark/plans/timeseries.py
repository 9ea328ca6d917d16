"""Time-series diagnostics over the daily ingest-volume series
(SURVEY.md §2.H extensions): autocorrelation (weekly rhythm check),
CUSUM change-point scan (did the crawl mix shift?), and EWMA anomaly
flags (the batch twin of an ops alert). The reference keeps a
processing audit trail and reports per-run volumes
(src/database.py:214-258, get_statistics); these operators are the
monitoring layer a 100 TB ingest pipeline runs over that same trail.

Scale shape shared by all three: the event stream collapses to ONE
daily-count aggregate (map-side combined, one shuffle on the day key);
every subsequent window runs over the tiny daily table (bounded by
calendar days, thousands of rows at any corpus size), so the
single-partition ORDER BY d windows are O(days), never O(events).

Determinism: all statistics are computed in pure integer arithmetic —
centered terms are scaled by the day count (c_t = n_t*N - S avoids
the fractional mean), EWMA weights are the exact integers 3^j*4^(7-j)
(alpha = 1/4 over an 8-day finite window), and every ratio is either
an integer `div` or a single ROUND(int/int, 6) — so distributed sums
can never diverge from the single-threaded oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register

ACF_MAX_LAG = 7

_DAILY_SQL = """
daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
st AS (SELECT COUNT(*) AS nd, SUM(n) AS s FROM daily),
c AS (
  SELECT d, n, n * st.nd - st.s AS ct FROM daily CROSS JOIN st
)"""


def _daily_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n, ct) with ct = n*N - S: the mean-centered daily count
    scaled to stay integer (N = #days, S = total events)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    st = daily.agg(F.count("*").alias("nd"), F.sum("n").alias("s"))
    return daily.crossJoin(F.broadcast(st)).select(
        "d", "n", "nd", "s", (F.col("n") * F.col("nd") - F.col("s")).alias("ct")
    )


def _acf_oracle() -> str:
    # centered terms go through DECIMAL(19,0)->(38,0) products so the
    # integer path cannot overflow even at planetary event volumes
    leads = ", ".join(
        f"LEAD(ctd, {k}) OVER (ORDER BY d) AS l{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    arms = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, ctd * l{k} AS prod, l{k} IS NOT NULL AS ok FROM w"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH {_DAILY_SQL},
cd AS (SELECT d, CAST(ct AS DECIMAL(19,0)) AS ctd FROM c),
w AS (SELECT d, ctd, {leads} FROM cd),
den AS (SELECT SUM(ctd * ctd) AS dd FROM cd),
arms AS ({arms})
SELECT CAST(lag AS INT) AS lag,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CASE WHEN dd = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((2000000 * CAST(SUM(CASE WHEN ok THEN prod ELSE 0 END) AS HUGEINT)
                       + CAST(dd AS HUGEINT))
                      // (2 * CAST(dd AS HUGEINT)) AS BIGINT)
       END AS acf_e6
FROM arms CROSS JOIN den GROUP BY lag, dd ORDER BY lag
"""


@register(
    "acf_daily",
    oracle=_acf_oracle(),
    doc=(
        "Autocorrelation of the daily event-count series at lags 1..7 "
        "— the weekly-rhythm diagnostic (a healthy product stream "
        "shows an acf peak at lag 7; a flat acf means the volume is "
        "noise). Numerator and denominator are pure-integer sums of "
        "scaled centered counts (c_t = n_t*N - S) and acf ships as "
        "the exact e6 integer (2e6*num + dd) div (2*dd) — truncating "
        "toward zero identically in both engines for negative lags "
        "too, no double anywhere. One "
        "event-stream aggregate, then 7 LEADs in one O(days) window "
        "pass and a posexplode per-lag rollup (SURVEY §2.H)."
    ),
)
def acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _daily_centered(spark, sf_dir).select(
        "d", F.col("ct").cast("decimal(19,0)").alias("ctd")
    )
    w = Window.orderBy("d")
    leads = [F.lead("ctd", k).over(w).alias(f"l{k}") for k in range(1, ACF_MAX_LAG + 1)]
    wd = c.select("d", "ctd", *leads)
    den = c.agg(F.sum(F.col("ctd") * F.col("ctd")).alias("dd"))
    arms = wd.select(
        F.posexplode(
            F.array(*[
                F.struct(
                    (F.col("ctd") * F.col(f"l{k}")).alias("prod"),
                    F.col(f"l{k}").isNotNull().alias("ok"),
                )
                for k in range(1, ACF_MAX_LAG + 1)
            ])
        ).alias("pos", "a")
    ).select((F.col("pos") + 1).alias("lag"), "a.prod", "a.ok")
    return (
        arms.groupBy(F.col("lag").cast("int").alias("lag"))
        .agg(
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("ok"), F.col("prod")).otherwise(0)).alias("num"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            # exact e6 integer presentation; num may be negative — the
            # (2e6*num + dd) div (2*dd) form truncates toward zero
            # IDENTICALLY in Spark div and DuckDB //, so the value is
            # engine-stable by construction
            F.when(F.col("dd") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "CAST((CAST(2000000 AS DECIMAL(38,0)) * num + dd)"
                    " div (CAST(2 AS DECIMAL(38,0)) * dd) AS BIGINT)"
                )
            )
            .alias("acf_e6"),
        )
        .orderBy("lag")
    )


CUSUM_TOP = 5


@register(
    "cusum_changepoint",
    oracle=f"""
WITH {_DAILY_SQL},
s AS (
  SELECT d, n, ct,
         SUM(ct) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cusum,
         st2.nd * st2.s AS scale
  FROM c CROSS JOIN st st2
)
SELECT d, n, CAST(cusum AS BIGINT) AS cusum,
       CAST(ABS(cusum) // GREATEST(1, scale // 10000) AS BIGINT) AS share_bps
FROM s ORDER BY ABS(cusum) DESC, d LIMIT {CUSUM_TOP}
""",
    doc=(
        "CUSUM change-point scan over the daily event-count series: "
        "the running sum of scaled centered counts peaks (in absolute "
        "value) at the most likely mean-shift day — the 'did the "
        "crawl mix change here?' diagnostic. Integer cumulative sums "
        "(no fractional mean: c_t = n_t*N - S), normalized to basis "
        "points of the N*S worst case by pre-scaled integer div "
        "(divisor div 10000 first, so no intermediate exceeds the "
        "N*S bigint bound). One event "
        "aggregate + one O(days) running-sum window + a top-5 "
        "TakeOrderedAndProject (SURVEY §2.H)."
    ),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _daily_centered(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = c.select(
        "d",
        "n",
        F.sum("ct").over(w).alias("cusum"),
        (F.col("nd") * F.col("s")).alias("scale"),
    )
    return (
        s.select(
            "d",
            "n",
            F.col("cusum").cast("bigint").alias("cusum"),
            F.expr("abs(cusum) div greatest(1L, scale div 10000)")
            .cast("bigint")
            .alias("share_bps"),
        )
        .orderBy(F.abs(F.col("cusum")).desc(), "d")
        .limit(CUSUM_TOP)
    )


# EWMA with alpha=1/4 over the trailing 8 days (excluding today), as
# exact integer weights: w_j = 3^(j-1) * 4^(8-j) for lag j=1..8,
# sum(w) = 4^8 - 3^8 = 58975. A day is a spike when today's count
# exceeds 2x the smoothed baseline (n*den > 2*ewma), a drop when it
# falls below half (2*n*den < ewma).
EWMA_W = [3 ** (j - 1) * 4 ** (8 - j) for j in range(1, 9)]
EWMA_DEN = sum(EWMA_W)  # 58975


@register(
    "ewma_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT d, n,
         {" + ".join(f"LAG(n, {j}) OVER (ORDER BY d) * {EWMA_W[j - 1]}" for j in range(1, 9))} AS ew,
         LAG(n, 8) OVER (ORDER BY d) AS l8
  FROM daily
)
SELECT d, n,
       CAST(ew // {EWMA_DEN} AS BIGINT) AS baseline,
       CASE WHEN n * {EWMA_DEN} > 2 * ew THEN 'spike'
            WHEN 2 * n * {EWMA_DEN} < ew THEN 'drop'
            ELSE 'normal' END AS status
FROM w WHERE l8 IS NOT NULL ORDER BY d
""",
    doc=(
        "EWMA anomaly flags over the daily event-count series "
        "(alpha=1/4, 8-day finite window, excluding the current day): "
        "each day's count is compared against its exponentially "
        "smoothed trailing baseline — >2x = spike, <0.5x = drop. The "
        "8 EWMA weights are the exact integers 3^(j-1)*4^(8-j) "
        "(den = 4^8-3^8 = 58975), so baseline and both thresholds are "
        "pure integer arithmetic — no float recursion, no rounding "
        "edge. One event aggregate + 8 LAGs in one O(days) window "
        "pass; the streaming twin carries the same 8-value state "
        "(SURVEY §2.H)."
    ),
)
def ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.orderBy("d")
    ew = None
    for j in range(1, 9):
        term = F.lag("n", j).over(w) * F.lit(EWMA_W[j - 1])
        ew = term if ew is None else ew + term
    wd = daily.select(
        "d", "n", ew.alias("ew"), F.lag("n", 8).over(w).alias("l8")
    ).where(F.col("l8").isNotNull())
    return wd.select(
        "d",
        "n",
        F.expr(f"ew div {EWMA_DEN}").cast("bigint").alias("baseline"),
        F.when(F.col("n") * EWMA_DEN > 2 * F.col("ew"), "spike")
        .when(2 * F.col("n") * EWMA_DEN < F.col("ew"), "drop")
        .otherwise("normal")
        .alias("status"),
    ).orderBy("d")


GAPFILL_FROM = "1996-01-01"
GAPFILL_TO = "1996-12-31"


@register(
    "gap_fill_daily",
    oracle=f"""
WITH d AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders
  WHERE o_orderdate >= DATE '{GAPFILL_FROM}' AND o_orderdate <= DATE '{GAPFILL_TO}'
  GROUP BY 1, 2
),
cal AS (
  SELECT UNNEST(generate_series(DATE '{GAPFILL_FROM}', DATE '{GAPFILL_TO}',
                                INTERVAL 1 DAY))::DATE AS day
),
pri AS (SELECT DISTINCT priority FROM d),
grid AS (SELECT p.priority, c.day FROM pri p CROSS JOIN cal c),
j AS (
  SELECT g.priority, g.day, COALESCE(d.n, 0) AS n_orders, d.rev
  FROM grid g LEFT JOIN d ON d.priority = g.priority AND d.day = g.day
)
SELECT priority, day, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(LAST_VALUE(rev IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS rev_centi_ff
FROM j ORDER BY priority, day
""",
    doc=(
        "Calendar gap-fill + forward-fill of the per-priority daily "
        "revenue series (the 1996 window): the series-densification "
        "step every dashboard/forecast layer needs, since a day with "
        "no orders is a REAL zero, not a missing sample. Shape: the "
        "fact table collapses to one map-side-combined daily "
        "aggregate (the only shuffle that sees order rows; the date "
        "filter is pushed to the scan), the dense grid is "
        "keys x calendar-days built from an exploded `sequence()` "
        "literal (tiny by construction — days since epoch bounds it), "
        "and the forward fill is one `last(ignorenulls)` running "
        "window per key over the grid, never over facts. Revenue "
        "stays exact integer centi-units end-to-end; leading days "
        "before a key's first sale stay NULL in both engines "
        "(SURVEY §2.H)."
    ),
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(GAPFILL_FROM).cast("date"))
            & (F.col("o_orderdate") <= F.lit(GAPFILL_TO).cast("date"))
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"),
        )
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(GAPFILL_FROM).cast("date"), F.lit(GAPFILL_TO).cast("date")
            )
        ).alias("day")
    )
    pri = d.select("priority").distinct()
    grid = pri.crossJoin(F.broadcast(cal))
    j = grid.join(d, ["priority", "day"], "left")
    wff = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.select(
            "priority",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.last("rev", ignorenulls=True).over(wff).cast("bigint").alias("rev_centi_ff"),
        )
        .orderBy("priority", "day")
    )


ROLL_FROM = "1996-01-01"
ROLL_TO = "1996-12-31"
ROLL_DAYS = 30


@register(
    "rolling_30d_revenue",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev,
         COUNT(*) AS n
  FROM orders GROUP BY 1
),
r AS (
  SELECT day,
         CAST(SUM(rev) OVER w AS BIGINT) AS rev_centi_30d,
         CAST(SUM(n) OVER w AS BIGINT) AS n_orders_30d,
         CAST(COUNT(*) OVER w AS BIGINT) AS days_present
  FROM d
  WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', day)
               RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT * FROM r
WHERE day >= DATE '{ROLL_FROM}' AND day <= DATE '{ROLL_TO}'
ORDER BY day
""",
    doc=(
        "Trailing-30-day revenue per day (reported for 1996): the "
        "time-based RANGE window frame — `RANGE BETWEEN 29 PRECEDING "
        "AND CURRENT ROW` over epoch days — that a row-based frame "
        "cannot express when calendar days are MISSING from the "
        "series (TESTDATA's order stream has real gaps; a ROWS frame "
        "would silently widen across them). Shape: one map-side-"
        "combined daily aggregate is the only pass over order rows; "
        "the unpartitioned range window then runs over the "
        "calendar-bounded daily table (thousands of rows at ANY "
        "corpus size — the timeseries.py contract), so the single-"
        "partition sort is O(days), never O(orders). Exact integer "
        "centi-units end-to-end (SURVEY §2.H)."
    ),
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"),
        F.count("*").alias("n"),
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-(ROLL_DAYS - 1), Window.currentRow)
    )
    return (
        d.select(
            "day",
            F.sum("rev").over(w).cast("bigint").alias("rev_centi_30d"),
            F.sum("n").over(w).cast("bigint").alias("n_orders_30d"),
            F.count("*").over(w).cast("bigint").alias("days_present"),
        )
        .where(
            (F.col("day") >= F.lit(ROLL_FROM).cast("date"))
            & (F.col("day") <= F.lit(ROLL_TO).cast("date"))
        )
        .orderBy("day")
    )


@register(
    "weekday_anova",
    oracle="""
WITH d AS (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 AS day_idx,
         COUNT(*) AS c
  FROM events GROUP BY 1
),
g AS (
  SELECT (day_idx + 4) % 7 AS wd, COUNT(*) AS m, SUM(c) AS sg,
         CAST(ROUND(CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*), 6) AS DECIMAL(18,6)) AS term
  FROM d GROUP BY 1
),
s AS (
  SELECT SUM(m) AS n_days, COUNT(*) AS k, SUM(sg) AS s_all,
         SUM(term) AS t,
         (SELECT SUM(c * c) FROM d) AS q
  FROM g
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(k AS BIGINT) AS k_groups,
       CAST(s_all * 1000 // n_days AS BIGINT) AS grand_mean_milli,
       ((CAST(t AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days) / (k - 1))
         / ((CAST(q AS DOUBLE) - CAST(t AS DOUBLE)) / (n_days - k)) AS f_stat,
       CAST(ROUND((CAST(t AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days)
                  / (CAST(q AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days) * 10000)
            AS BIGINT) AS eta_sq_bps
FROM s
""",
    doc=(
        "One-way ANOVA for the weekday effect on daily event volume — "
        "the SIGNIFICANCE companion to seasonal_strength's R² (a "
        "seasonal share can look large on a short noisy series; the "
        "F-statistic says whether 7 weekday means beat noise given "
        "the day count). All sufficient statistics are exact integer "
        "moments off the day-cardinality rollup (one events scan); "
        "the 7 per-group between terms S_g²/m_g are pre-rounded to "
        "DECIMAL(18,6) so their sum is order-insensitive, and the "
        "F/eta² doubles are single structurally-identical expressions "
        "over those exact inputs (kneser_ney convention: unrounded "
        "IEEE quotient ships). Weekday = (epoch_day + 4) mod 7 — pure "
        "integer, no calendar functions to disagree on "
        "(SURVEY §2.L)."
    ),
)
def weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.expr("unix_micros(cast(ts as timestamp)) div 1000000 div 86400").alias(
                "day_idx"
            )
        )
        .groupBy("day_idx")
        .agg(F.count("*").alias("c"))
    )
    g = d.groupBy(((F.col("day_idx") + 4) % 7).alias("wd")).agg(
        F.count("*").alias("m"),
        F.sum("c").alias("sg"),
        F.expr("CAST(ROUND(CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*), 6) AS DECIMAL(18,6))").alias(
            "term"
        ),
    )
    q = d.agg(F.sum(F.col("c") * F.col("c")).alias("q"))
    s = g.agg(
        F.sum("m").alias("n_days"),
        F.count("*").alias("k"),
        F.sum("sg").alias("s_all"),
        F.sum("term").alias("t"),
    ).crossJoin(F.broadcast(q))
    return s.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("k").cast("bigint").alias("k_groups"),
        F.expr("s_all * 1000 div n_days").cast("bigint").alias("grand_mean_milli"),
        F.expr(
            "((CAST(t AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days) / (k - 1))"
            " / ((CAST(q AS DOUBLE) - CAST(t AS DOUBLE)) / (n_days - k))"
        ).alias("f_stat"),
        F.expr(
            "CAST(ROUND((CAST(t AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days)"
            " / (CAST(q AS DOUBLE) - CAST(s_all AS DOUBLE) * s_all / n_days) * 10000)"
            " AS BIGINT)"
        ).alias("eta_sq_bps"),
    )


def _pacf_exprs(engine_round) -> list[str]:
    """Durbin–Levinson recursion to lag 3 from the ROUNDED acf values
    r1..r3: rounding the three anchors to 6 dp FIRST means both
    engines run the identical recursion on identical doubles, so the
    outputs are bit-equal without rounding the (nonlinear) results."""
    phi22 = "((r2 - r1 * r1) / (1.0 - r1 * r1))"
    phi21 = f"(r1 * (1.0 - {phi22}))"
    phi33 = (
        f"((r3 - {phi21} * r2 - {phi22} * r1)"
        f" / (1.0 - {phi21} * r1 - {phi22} * r2))"
    )
    return ["r1", phi22, phi33]


@register(
    "pacf_daily",
    oracle=f"""
WITH {_DAILY_SQL},
cd AS (SELECT d, CAST(ct AS DECIMAL(19,0)) AS ctd FROM c),
w AS (SELECT d, ctd,
             LEAD(ctd, 1) OVER (ORDER BY d) AS l1,
             LEAD(ctd, 2) OVER (ORDER BY d) AS l2,
             LEAD(ctd, 3) OVER (ORDER BY d) AS l3
      FROM cd),
m AS (
  SELECT SUM(ctd * ctd) AS dd,
         SUM(CASE WHEN l1 IS NOT NULL THEN ctd * l1 ELSE 0.0 END) AS n1,
         SUM(CASE WHEN l2 IS NOT NULL THEN ctd * l2 ELSE 0.0 END) AS n2,
         SUM(CASE WHEN l3 IS NOT NULL THEN ctd * l3 ELSE 0.0 END) AS n3
  FROM w
),
r AS (
  SELECT ROUND(CAST(n1 AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS r1,
         ROUND(CAST(n2 AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS r2,
         ROUND(CAST(n3 AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS r3
  FROM m
)
SELECT CAST(u.lag AS INT) AS lag,
       CASE u.lag WHEN 1 THEN {_pacf_exprs(None)[0]}
                  WHEN 2 THEN {_pacf_exprs(None)[1]}
                  ELSE {_pacf_exprs(None)[2]} END AS pacf
FROM r CROSS JOIN (SELECT unnest([1, 2, 3]) AS lag) u
ORDER BY lag
""",
    doc=(
        "Partial autocorrelation of the daily series at lags 1..3 via "
        "the Durbin–Levinson recursion — the AR-order diagnostic acf "
        "can't give (acf at lag 2 can be large purely because lag 1 "
        "is; pacf removes the shorter-lag contribution, so a pacf "
        "cutoff after lag p says 'fit AR(p)'). The three acf anchors "
        "come from the same exact integer centered moments as "
        "acf_daily and are rounded to 6 dp BEFORE the recursion, so "
        "both engines run the identical nonlinear arithmetic on "
        "identical doubles; the 3-row melt is constant-space "
        "(SURVEY §2.H)."
    ),
)
def pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _daily_centered(spark, sf_dir).select(
        "d", F.col("ct").cast("decimal(19,0)").alias("ctd")
    )
    w = Window.orderBy("d")
    wd = c.select(
        "ctd",
        F.lead("ctd", 1).over(w).alias("l1"),
        F.lead("ctd", 2).over(w).alias("l2"),
        F.lead("ctd", 3).over(w).alias("l3"),
    )
    m = wd.agg(
        F.sum(F.col("ctd") * F.col("ctd")).alias("dd"),
        F.sum(F.when(F.col("l1").isNotNull(), F.col("ctd") * F.col("l1")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("l2").isNotNull(), F.col("ctd") * F.col("l2")).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("l3").isNotNull(), F.col("ctd") * F.col("l3")).otherwise(0)).alias("n3"),
    )
    r = m.select(
        F.round(F.col("n1").cast("double") / F.col("dd").cast("double"), 6).alias("r1"),
        F.round(F.col("n2").cast("double") / F.col("dd").cast("double"), 6).alias("r2"),
        F.round(F.col("n3").cast("double") / F.col("dd").cast("double"), 6).alias("r3"),
    )
    e1, e2, e3 = _pacf_exprs(None)
    rows = F.array(
        F.struct(F.lit(1).alias("lag"), F.expr(e1).alias("pacf")),
        F.struct(F.lit(2).alias("lag"), F.expr(e2).alias("pacf")),
        F.struct(F.lit(3).alias("lag"), F.expr(e3).alias("pacf")),
    )
    return (
        r.select(F.explode(rows).alias("x"))
        .select(F.col("x.lag").cast("int").alias("lag"), F.col("x.pacf").alias("pacf"))
        .orderBy("lag")
    )


def _mk_oracle() -> str:
    return f"""
WITH {_DAILY_SQL},
p AS (
  SELECT CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b ON a.d < b.d
),
s AS (SELECT CAST(COALESCE(SUM(sg), 0) AS BIGINT) AS s_stat FROM p),
nd AS (SELECT COUNT(*) AS n FROM daily),
ties AS (SELECT n AS val, COUNT(*) AS t FROM daily GROUP BY n),
v AS (
  SELECT (SELECT n * (n - 1) * (2 * n + 5) FROM nd)
         - COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS var18
  FROM ties
)
SELECT CAST(nd.n AS BIGINT) AS n_days,
       s.s_stat,
       CAST(v.var18 AS BIGINT) AS var_s_x18,
       CASE WHEN v.var18 = 0 THEN 0.0
            WHEN s.s_stat > 0
              THEN ROUND((s.s_stat - 1) / SQRT(v.var18 / 18.0), 6)
            WHEN s.s_stat < 0
              THEN ROUND((s.s_stat + 1) / SQRT(v.var18 / 18.0), 6)
            ELSE 0.0 END AS z_score
FROM nd CROSS JOIN s CROSS JOIN v
"""


@register(
    "mann_kendall_trend",
    oracle=_mk_oracle(),
    doc=(
        "Mann-Kendall monotone-trend test on the daily event-count "
        "series: S = sum of sign(n_j - n_i) over day pairs i<j, "
        "tie-corrected variance (x18 to stay integer), continuity-"
        "corrected z — the standard NONPARAMETRIC drift detector "
        "(CUSUM finds a change POINT, MK asks 'is volume trending at "
        "all' without assuming normality; a |z|>1.96 series deserves "
        "a look before it becomes a capacity incident). The pair join "
        "is CALENDAR-bounded — events collapse to one daily row "
        "first, so the quadratic is over days, never events; all "
        "integer until the one final z division (SURVEY §2.H)."
    ),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    a = daily.select(F.col("d").alias("da"), F.col("n").alias("na"))
    b = daily.select(F.col("d").alias("db"), F.col("n").alias("nb"))
    sg = (
        F.when(F.col("nb") > F.col("na"), 1)
        .when(F.col("nb") < F.col("na"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(F.coalesce(F.sum(sg), F.lit(0)).cast("bigint").alias("s_stat"))
    )
    nd = daily.agg(F.count("*").alias("n"))
    ties = daily.groupBy("n").agg(F.count("*").alias("t"))
    tsum = ties.agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
        ).alias("tie_sum")
    )
    z = (
        F.when(F.col("var18") == 0, F.lit(0.0))
        .when(
            F.col("s_stat") > 0,
            F.round((F.col("s_stat") - 1) / F.sqrt(F.col("var18") / 18.0), 6),
        )
        .when(
            F.col("s_stat") < 0,
            F.round((F.col("s_stat") + 1) / F.sqrt(F.col("var18") / 18.0), 6),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        nd.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tsum))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            "s_stat",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_sum")
            )
            .cast("bigint")
            .alias("var_s_x18"),
            "tie_sum",
        )
        .withColumn("var18", F.col("var_s_x18"))
        .select("n_days", "s_stat", "var_s_x18", z.alias("z_score"))
    )


@register(
    "theil_sen_trend",
    oracle=f"""
WITH {_DAILY_SQL},
x AS (
  SELECT d, n, date_diff('day', (SELECT MIN(d) FROM daily), d) AS xi FROM daily
),
sl AS (
  SELECT CAST(b.n - a.n AS DOUBLE) / (b.xi - a.xi) AS slope
  FROM x a JOIN x b ON a.xi < b.xi
),
m AS (SELECT quantile_cont(slope, 0.5) AS slope FROM sl),
ic AS (
  SELECT quantile_cont(x.n - m.slope * x.xi, 0.5) AS intercept
  FROM x CROSS JOIN m
)
SELECT CAST((SELECT COUNT(*) FROM x) AS BIGINT) AS n_days,
       CAST((SELECT COUNT(*) FROM sl) AS BIGINT) AS n_pairs,
       ROUND(m.slope, 6) AS slope_per_day,
       ROUND(ic.intercept, 6) AS intercept
FROM m CROSS JOIN ic
""",
    doc=(
        "Theil-Sen robust trend of the daily event-count series: "
        "slope = median of all pairwise slopes, intercept = median of "
        "(n_i - slope*x_i) — up to 29% of days can be corrupted "
        "(deploy spikes, backfill days) before the estimate moves, "
        "where OLS breaks on one outlier; the robust twin of "
        "ols_price_size for the ingest-volume trail. Both medians are "
        "interpolated percentiles over IDENTICAL double sets in both "
        "engines, so the gate hash-matches. The pair space is "
        "CALENDAR-bounded (days², not events²; events collapse to "
        "daily rows in one map-side-combined shuffle) (SURVEY §2.H)."
    ),
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    mn = daily.agg(F.min("d").alias("d0"))
    x = daily.crossJoin(F.broadcast(mn)).select(
        "n", F.datediff(F.col("d"), F.col("d0")).cast("long").alias("xi")
    )
    a = x.select(F.col("xi").alias("xa"), F.col("n").alias("na"))
    b = x.select(F.col("xi").alias("xb"), F.col("n").alias("nb"))
    sl = a.join(b, F.col("xa") < F.col("xb")).select(
        ((F.col("nb") - F.col("na")).cast("double") / (F.col("xb") - F.col("xa"))).alias(
            "slope"
        )
    )
    m = sl.agg(
        F.expr("percentile(slope, 0.5)").alias("slope"),
        F.count("*").cast("bigint").alias("n_pairs"),
    )
    ic = x.crossJoin(F.broadcast(m)).agg(
        F.expr("percentile(n - slope * xi, 0.5)").alias("intercept"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    return m.crossJoin(F.broadcast(ic)).select(
        "n_days",
        "n_pairs",
        F.round("slope", 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"),
    )


_HURST_WINDOWS = (5, 10, 15)


def _hurst_oracle() -> str:
    per_w = []
    for w in _HURST_WINDOWS:
        per_w.append(f"""
b{w} AS (
  SELECT r // {w} AS blk, r % {w} AS pos, n
  FROM idx WHERE r < ({w}) * ((SELECT COUNT(*) FROM idx) // {w})
),
m{w} AS (SELECT blk, CAST(SUM(n) AS DOUBLE) / {w} AS mu,
                SQRT(SUM((n - CAST((SELECT SUM(n) FROM b{w} x WHERE x.blk = b{w}.blk) AS DOUBLE) / {w})
                         * (n - CAST((SELECT SUM(n) FROM b{w} x WHERE x.blk = b{w}.blk) AS DOUBLE) / {w})) / {w}) AS s
         FROM b{w} GROUP BY blk),
z{w} AS (
  SELECT b.blk,
         SUM(b.n - m.mu) OVER (PARTITION BY b.blk ORDER BY b.pos) AS z
  FROM b{w} b JOIN m{w} m USING (blk)
),
rs{w} AS (
  SELECT z.blk,
         CAST(ROUND((MAX(z.z) - MIN(z.z)) / ANY_VALUE(m.s), 9) AS DECIMAL(18,9)) AS rs
  FROM z{w} z JOIN m{w} m USING (blk)
  WHERE m.s > 0 GROUP BY z.blk
),
a{w} AS (SELECT COUNT(*) AS nb, ROUND(CAST(SUM(rs) AS DOUBLE) / COUNT(*), 6) AS mrs FROM rs{w})""")
    ws = list(_HURST_WINDOWS)
    # 3-point log-log OLS for H: slope of ln(mrs) on ln(w)
    lx = [f"LN({w}.0)" for w in ws]
    ly = [f"LN((SELECT mrs FROM a{w}))" for w in ws]
    n = len(ws)
    sx = " + ".join(lx)
    sy = " + ".join(ly)
    sxx = " + ".join(f"{x} * {x}" for x in lx)
    sxy = " + ".join(f"{x} * {y}" for x, y in zip(lx, ly))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS r, n FROM daily),
{", ".join(per_w).lstrip()}
SELECT CAST((SELECT COUNT(*) FROM idx) AS BIGINT) AS n_days,
       (SELECT mrs FROM a5) AS mean_rs_w5,
       (SELECT mrs FROM a10) AS mean_rs_w10,
       (SELECT mrs FROM a15) AS mean_rs_w15,
       ROUND(({n} * ({sxy}) - ({sx}) * ({sy}))
             / ({n} * ({sxx}) - ({sx}) * ({sx})), 4) AS hurst
"""


@register(
    "hurst_exponent",
    oracle=_hurst_oracle(),
    doc=(
        "Hurst exponent of the daily event-count series via rescaled-"
        "range (R/S) analysis over block sizes 5/10/15 days: H≈0.5 "
        "means memoryless volume, H>0.5 long-range persistence (busy "
        "days cluster — capacity must be sized for runs, not means), "
        "H<0.5 mean-reversion; complements acf_daily (fixed-lag "
        "correlation) with the scale-free view. Per-block R/S is "
        "rounded to DECIMAL(18,9) before averaging (order-insensitive "
        "sums); H is a 3-point log-log OLS in shared double "
        "expressions. Everything after the one daily rollup is "
        "calendar-bounded (SURVEY §2.H)."
    ),
)
def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).alias("r"), "n"
    )
    nd = idx.agg(F.count("*").alias("n_days"))
    outs = []
    for w in _HURST_WINDOWS:
        b = (
            idx.crossJoin(F.broadcast(nd))
            .where(F.col("r") < w * F.floor(F.col("n_days") / w))
            .select(
                (F.col("r") / w).cast("long").alias("blk"),
                (F.col("r") % w).alias("pos"),
                "n",
            )
        )
        m = b.groupBy("blk").agg((F.sum("n").cast("double") / w).alias("mu"))
        bm = b.join(m, "blk")
        s = bm.groupBy("blk").agg(
            F.sqrt(
                F.sum((F.col("n") - F.col("mu")) * (F.col("n") - F.col("mu"))) / w
            ).alias("s")
        )
        z = bm.select(
            "blk",
            F.sum(F.col("n") - F.col("mu"))
            .over(Window.partitionBy("blk").orderBy("pos"))
            .alias("z"),
        )
        rs = (
            z.groupBy("blk")
            .agg((F.max("z") - F.min("z")).alias("range"))
            .join(s, "blk")
            .where(F.col("s") > 0)
            .select(
                F.round(F.col("range") / F.col("s"), 9)
                .cast("decimal(18,9)")
                .alias("rs")
            )
        )
        outs.append(
            rs.agg(
                F.round(F.sum("rs").cast("double") / F.count("*"), 6).alias(
                    f"mean_rs_w{w}"
                )
            )
        )
    row = nd.select(F.col("n_days").cast("bigint").alias("n_days"))
    for o in outs:
        row = row.crossJoin(F.broadcast(o))
    import math

    ws = list(_HURST_WINDOWS)
    n = len(ws)
    lxs = [math.log(float(w)) for w in ws]
    sx = sum(lxs)
    sxx = sum(x * x for x in lxs)
    ly_cols = [F.log(F.col(f"mean_rs_w{w}")) for w in ws]
    sy = ly_cols[0]
    for c in ly_cols[1:]:
        sy = sy + c
    sxy = ly_cols[0] * F.lit(lxs[0])
    for c, x in zip(ly_cols[1:], lxs[1:]):
        sxy = sxy + c * F.lit(x)
    hurst = F.round(
        (F.lit(float(n)) * sxy - F.lit(sx) * sy)
        / F.lit(float(n) * sxx - sx * sx),
        4,
    )
    return row.select(
        "n_days", "mean_rs_w5", "mean_rs_w10", "mean_rs_w15", hurst.alias("hurst")
    )


# ---------------------------------------------------------------------------
# ljung_box_daily — portmanteau white-noise test on the daily series.
# ---------------------------------------------------------------------------

# chi-square 95% critical values for df = 1..ACF_MAX_LAG (plan
# constants, identical literals in both engines)
_CHI2_95 = (3.8415, 5.9915, 7.8147, 9.4877, 11.0705, 12.5916, 14.0671)


def _ljung_box_oracle() -> str:
    leads = ", ".join(
        f"LEAD(ctd, {k}) OVER (ORDER BY d) AS l{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    arms = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, ctd * l{k} AS prod, l{k} IS NOT NULL AS ok FROM w"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    crit = " ".join(
        f"WHEN {k} THEN {_CHI2_95[k - 1]}" for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH {_DAILY_SQL},
cd AS (SELECT d, CAST(ct AS DECIMAL(19,0)) AS ctd FROM c),
w AS (SELECT d, ctd, {leads} FROM cd),
den AS (SELECT SUM(ctd * ctd) AS dd FROM cd),
nn AS (SELECT nd FROM st),
arms AS ({arms}),
rr AS (
  SELECT lag,
         CASE WHEN dd = 0 THEN 0.0
              ELSE ROUND(CAST(SUM(CASE WHEN ok THEN prod ELSE 0.0 END) AS DOUBLE)
                         / CAST(dd AS DOUBLE), 6)
         END AS r
  FROM arms CROSS JOIN den GROUP BY lag, dd
),
q AS (
  SELECT lag, r, nd,
         SUM(r * r / (nd - lag)) OVER (ORDER BY lag) AS acc
  FROM rr CROSS JOIN nn
)
SELECT CAST(lag AS INT) AS lag,
       r AS acf,
       ROUND(nd * (nd + 2.0) * acc, 4) AS q_stat,
       CAST(CASE lag {crit} END AS DOUBLE) AS crit_95,
       ROUND(nd * (nd + 2.0) * acc, 4) > CASE lag {crit} END AS reject
FROM q ORDER BY lag
"""


@register(
    "ljung_box_daily",
    oracle=_ljung_box_oracle(),
    doc=(
        "Ljung-Box portmanteau test on the daily event-count series: "
        "Q(h) = N(N+2) * sum_k r_k^2/(N-k) for h = 1..7, against the "
        "chi-square 95% critical value at df = h — the formal "
        "is-this-white-noise companion to acf_daily (a rejected lag-7 "
        "Q is the statistical signature of weekly rhythm; a flat "
        "accepted Q means volume anomaly baselines can assume i.i.d.). "
        "Autocorrelations reuse the exact-integer centered-count path "
        "(r_k exact until one ROUND(int/int, 6)); the cumulative sum "
        "runs ascending over 7 ordered rows in both engines, so the "
        "double arithmetic is bit-identical. One event-stream "
        "aggregate, one O(days) window pass, dimension-sized "
        "everything after (SURVEY §2.H)."
    ),
)
def ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _daily_centered(spark, sf_dir).select(
        "d", "nd", F.col("ct").cast("decimal(19,0)").alias("ctd")
    )
    w = Window.orderBy("d")
    leads = [F.lead("ctd", k).over(w).alias(f"l{k}") for k in range(1, ACF_MAX_LAG + 1)]
    wd = c.select("d", "ctd", *leads)
    den = c.agg(
        F.sum(F.col("ctd") * F.col("ctd")).alias("dd"), F.max("nd").alias("nd")
    )
    arms = wd.select(
        F.posexplode(
            F.array(*[
                F.struct(
                    (F.col("ctd") * F.col(f"l{k}")).alias("prod"),
                    F.col(f"l{k}").isNotNull().alias("ok"),
                )
                for k in range(1, ACF_MAX_LAG + 1)
            ])
        ).alias("pos", "a")
    ).select((F.col("pos") + 1).alias("lag"), "a.prod", "a.ok")
    rr = (
        arms.groupBy("lag")
        .agg(F.sum(F.when(F.col("ok"), F.col("prod")).otherwise(0)).alias("num"))
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "nd",
            F.when(F.col("dd") == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("num").cast("double") / F.col("dd").cast("double"), 6)
            )
            .alias("r"),
        )
    )
    cum = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    crit = F.element_at(
        F.array(*[F.lit(v) for v in _CHI2_95]), F.col("lag").cast("int")
    )
    q = F.round(
        F.col("nd") * (F.col("nd") + 2.0)
        * F.sum(F.col("r") * F.col("r") / (F.col("nd") - F.col("lag"))).over(cum),
        4,
    )
    return rr.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("r").alias("acf"),
        q.alias("q_stat"),
        crit.alias("crit_95"),
        (q > crit).alias("reject"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# periodogram_daily — spectral period detection with plan-constant trig.
# ---------------------------------------------------------------------------

_PG_PERIODS = tuple(range(2, 15))  # candidate periods in days
_PG_SCALE = 10**9


def _pg_tables() -> dict[int, tuple[list[int], list[int]]]:
    """Per-period (cos, sin) tables at phase 2*pi*r/p, scaled to
    integers at 1e9. Computed ONCE in Python and inlined as literals
    into BOTH engines' plans, so no cross-engine libm last-ulp
    divergence can ever reach the data path."""
    import math

    out: dict[int, tuple[list[int], list[int]]] = {}
    for p in _PG_PERIODS:
        cs = [round(math.cos(2.0 * math.pi * r / p) * _PG_SCALE) for r in range(p)]
        sn = [round(math.sin(2.0 * math.pi * r / p) * _PG_SCALE) for r in range(p)]
        out[p] = (cs, sn)
    return out


def _periodogram_oracle() -> str:
    tabs = _pg_tables()
    arms = "\n  UNION ALL ".join(
        f"SELECT {p} AS period, "
        f"CAST([{', '.join(map(str, tabs[p][0]))}][(di % {p}) + 1] AS DECIMAL(10,0)) AS tc, "
        f"CAST([{', '.join(map(str, tabs[p][1]))}][(di % {p}) + 1] AS DECIMAL(10,0)) AS ts_, "
        f"ctd FROM cd"
        for p in _PG_PERIODS
    )
    return f"""
WITH {_DAILY_SQL},
cd AS (
  SELECT (d - DATE '1970-01-01') AS di, CAST(ct AS DECIMAL(19,0)) AS ctd FROM c
),
den AS (SELECT SUM(ctd * ctd) AS dd FROM cd),
arms AS ({arms}),
pw AS (
  SELECT period,
         SUM(ctd * tc) AS cs,
         SUM(ctd * ts_) AS ss
  FROM arms GROUP BY period
),
p2 AS (
  SELECT period,
         CASE WHEN dd = 0 THEN 0.0
              ELSE ROUND(((CAST(cs AS DOUBLE) / {_PG_SCALE}.0)
                          * (CAST(cs AS DOUBLE) / {_PG_SCALE}.0)
                          + (CAST(ss AS DOUBLE) / {_PG_SCALE}.0)
                          * (CAST(ss AS DOUBLE) / {_PG_SCALE}.0))
                         / CAST(dd AS DOUBLE), 6)
         END AS power
  FROM pw CROSS JOIN den
)
SELECT CAST(period AS INT) AS period, power,
       ROW_NUMBER() OVER (ORDER BY power DESC, period) = 1 AS is_top
FROM p2 ORDER BY period
"""


@register(
    "periodogram_daily",
    oracle=_periodogram_oracle(),
    doc=(
        "Daily-series periodogram over candidate periods 2..14 days: "
        "normalized spectral power (C_p^2 + S_p^2)/sum(c^2) of the "
        "mean-centered daily counts, with is_top marking the dominant "
        "period — the direct period DETECTOR next to acf_daily's "
        "correlogram (a weekly product rhythm lights up period 7 "
        "without the analyst reading 7 acf rows). The cos/sin tables "
        "are computed once in Python, integer-scaled at 1e9, and "
        "inlined as identical literals in both engines — no libm call "
        "on either data path, so C/S are exact DECIMAL dot products "
        "(centered counts are already exact integers); one double "
        "division + ROUND(6) at the end. Shape: one daily rollup, one "
        "posexplode over 13 periods, one dimension-sized aggregate "
        "(SURVEY §2.H)."
    ),
)
def periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    tabs = _pg_tables()
    cd = _daily_centered(spark, sf_dir).select(
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("di"),
        F.col("ct").cast("decimal(19,0)").alias("ctd"),
    )
    den = cd.agg(F.sum(F.col("ctd") * F.col("ctd")).alias("dd"))
    arms = cd.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(p).alias("period"),
                    F.element_at(
                        F.array(*[F.lit(v) for v in tabs[p][0]]),
                        (F.col("di") % p + 1).cast("int"),
                    )
                    .cast("decimal(10,0)")
                    .alias("tc"),
                    F.element_at(
                        F.array(*[F.lit(v) for v in tabs[p][1]]),
                        (F.col("di") % p + 1).cast("int"),
                    )
                    .cast("decimal(10,0)")
                    .alias("ts_"),
                )
                for p in _PG_PERIODS
            ])
        ).alias("a"),
        "ctd",
    ).select("a.period", "a.tc", "a.ts_", "ctd")
    pw = arms.groupBy("period").agg(
        F.sum(F.col("ctd") * F.col("tc")).alias("cs"),
        F.sum(F.col("ctd") * F.col("ts_")).alias("ss"),
    )
    sc = float(_PG_SCALE)
    power = F.when(F.col("dd") == 0, F.lit(0.0)).otherwise(
        F.round(
            (
                (F.col("cs").cast("double") / sc) * (F.col("cs").cast("double") / sc)
                + (F.col("ss").cast("double") / sc) * (F.col("ss").cast("double") / sc)
            )
            / F.col("dd").cast("double"),
            6,
        )
    )
    p2 = pw.crossJoin(F.broadcast(den)).select(
        F.col("period").cast("int").alias("period"), power.alias("power")
    )
    w = Window.orderBy(F.desc("power"), "period")
    return p2.select(
        "period", "power", (F.row_number().over(w) == 1).alias("is_top")
    ).orderBy("period")


# ---------------------------------------------------------------------------
# poisson_dispersion_daily — overdispersion index of the daily counts.
# ---------------------------------------------------------------------------


@register(
    "poisson_dispersion_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM daily
)
SELECT nd AS n_days, s AS total_events,
       CAST(s * 1000 // nd AS BIGINT) AS mean_milli,
       ROUND(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / nd) / (nd - 1))
             / (CAST(s AS DOUBLE) / nd), 4) AS dispersion_index,
       ROUND((CAST(nd AS DOUBLE) * q - CAST(s AS DOUBLE) * s) / s, 4) AS chi2,
       nd - 1 AS dof,
       ((CAST(nd AS DOUBLE) * q - CAST(s AS DOUBLE) * s) / s - (nd - 1))
         / SQRT(2.0 * (nd - 1)) > 1.6449 AS overdispersed_95
FROM s
""",
    doc=(
        "Poisson overdispersion check on the daily event-count series: "
        "the variance-to-mean ratio (= 1 under a homogeneous Poisson "
        "arrival process) plus the classical chi-square dispersion "
        "statistic sum((c-mean)^2)/mean and its one-sided normal "
        "approximation z = (chi2 - dof)/sqrt(2 dof) at the 95% level. "
        "The load-model gate behind capacity planning (peak_concurrency) "
        "and anomaly thresholds (anomaly_zscore assumes the variance it "
        "estimates is stable): burstiness means Poisson SLO math is "
        "wrong. Sufficient statistics are three exact integers off the "
        "day rollup (n, sum, sum-of-squares) — one events scan, one "
        "O(days) reduce, doubles only in the two final shared "
        "expressions (SURVEY §2.H)."
    ),
)
def poisson_dispersion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    s = daily.agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    chi2 = F.expr("(CAST(nd AS DOUBLE) * q - CAST(s AS DOUBLE) * s) / s")
    return s.select(
        F.col("nd").alias("n_days"),
        F.col("s").alias("total_events"),
        F.expr("s * 1000 div nd").cast("bigint").alias("mean_milli"),
        F.round(
            F.expr(
                "((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / nd) / (nd - 1))"
                " / (CAST(s AS DOUBLE) / nd)"
            ),
            4,
        ).alias("dispersion_index"),
        F.round(chi2, 4).alias("chi2"),
        (F.col("nd") - 1).cast("bigint").alias("dof"),
        ((chi2 - (F.col("nd") - 1)) / F.sqrt(2.0 * (F.col("nd") - 1)) > 1.6449).alias(
            "overdispersed_95"
        ),
    )


# ---------------------------------------------------------------------------
# runs_test_daily — Wald–Wolfowitz randomness test on the daily series.
# ---------------------------------------------------------------------------


@register(
    "runs_test_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
m AS (SELECT CAST(ROUND(2 * median(c)) AS BIGINT) AS m2 FROM daily),
sgn AS (
  SELECT d, 2 * c > m.m2 AS above
  FROM daily CROSS JOIN m
  WHERE 2 * c <> m.m2
),
seq AS (
  SELECT d, above, LAG(above) OVER (ORDER BY d) AS prev FROM sgn
),
s AS (
  SELECT CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN prev IS NULL OR above <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM seq
)
SELECT n1 + n2 AS n_days_used, n1 AS n_above, n2 AS n_below, runs,
       ROUND((CAST(runs AS DOUBLE)
              - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))),
             4) AS z,
       ABS((CAST(runs AS DOUBLE)
            - (2.0 * n1 * n2 / (n1 + n2) + 1))
           / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                  / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))))
         > 1.96 AS reject_95
FROM s
""",
    doc=(
        "Wald–Wolfowitz runs test on the daily event-count series: are "
        "above-/below-median days randomly interleaved, or do they "
        "clump (trend / regime persistence) or alternate (negative "
        "autocorrelation)? The distribution-free companion to acf_daily "
        "— it needs no moment assumptions at all. Days are compared as "
        "2*count vs 2*median so the split threshold stays an exact "
        "BIGINT even when the median of an even day-count interpolates "
        "to x.5; exactly-at-median days are excluded (the standard "
        "treatment). The only ordered pass (LAG for run boundaries) is "
        "over the O(days) rollup — dimension-sized at any corpus scale; "
        "run/above/below tallies are exact integers and z is one shared "
        "double expression (SURVEY §2.H)."
    ),
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    m = daily.agg(
        F.round(2 * F.expr("median(c)")).cast("bigint").alias("m2")
    )
    sgn = (
        daily.crossJoin(F.broadcast(m))
        .where(2 * F.col("c") != F.col("m2"))
        .select("d", (2 * F.col("c") > F.col("m2")).alias("above"))
    )
    seq = sgn.select(
        "above", F.lag("above").over(Window.orderBy("d")).alias("prev")
    )
    s = seq.agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).cast("bigint").alias("n2"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("above") != F.col("prev")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("runs"),
    )
    z = (
        F.col("runs").cast("double")
        - (2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1)
    ) / F.sqrt(
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2")).cast("double")
            * (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return s.select(
        (F.col("n1") + F.col("n2")).cast("bigint").alias("n_days_used"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("runs"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# ks_uniform_hour — one-sample KS test of hour-of-day uniformity.
# ---------------------------------------------------------------------------


@register(
    "ks_uniform_hour",
    oracle="""
WITH hc AS (
  SELECT EXTRACT(hour FROM ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
cal AS (SELECT UNNEST(range(24)) AS h),
f AS (
  SELECT cal.h, COALESCE(hc.c, 0) AS c FROM cal LEFT JOIN hc ON cal.h = hc.h
),
w AS (
  SELECT h, SUM(c) OVER (ORDER BY h) AS cum,
         SUM(c) OVER () AS n
  FROM f
),
s AS (
  SELECT MAX(ABS(24 * cum - (h + 1) * n)) AS d_int, MAX(n) AS n FROM w
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST((1000000 * d_int) // (24 * n) AS BIGINT) AS d_stat_micro,
       CAST((1000000 * CAST(d_int AS HUGEINT) * CAST(d_int AS HUGEINT))
            // (576 * CAST(n AS HUGEINT)) AS BIGINT) AS ks_sq_e6,
       CAST(1000 * d_int AS DECIMAL(19,0)) * CAST(1000 * d_int AS DECIMAL(19,0))
           > CAST(1062238464 AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))
           AS reject_95
FROM s
""",
    doc=(
        "One-sample Kolmogorov-Smirnov test of hour-of-day uniformity: "
        "max ECDF gap against the discrete uniform CDF, evaluated at "
        "the 24 hour atoms (post-jump convention) — IS there a "
        "time-of-day effect at all, before hourly_histogram shows its "
        "shape and peak_load_report sizes for it; the one-sample "
        "companion to value_ks_drift's two-sample D. The gap is kept "
        "as the exact integer |24*cum - (h+1)*N| (no per-atom "
        "division); outputs follow the exact-presentation convention "
        "(no final ROUND(double) — the env-sensitive halfway hazard "
        "that made this query the first-ever red driver row, r8): "
        "d_stat_micro is the pure-integer (10^6*d_int) div (24n), "
        "reject_95 is the integer cross-multiplication (1000*d_int)^2 "
        "> 1358^2*576*n over DECIMAL(38,0) (1062238464 = 1358^2*576), "
        "and the KS statistic ships SQUARED in exact integer e6 units "
        "— ks_sq_e6 = (10^6*d_int^2) div (576*n), pure integer in "
        "DECIMAL(38,0)/HUGEINT (ks = sqrt(ks_sq_e6/10^6) is the "
        "caller's last-mile op). The raw unrounded D*sqrt(n) double "
        "was this query's SECOND driver red (r9): a shared IEEE op "
        "tree is NOT bit-stable across engine environments, so no "
        "output column may carry one. Its THIRD red (r10) was the "
        "oracle's un-cast window-sum n_events: SUM promotes to "
        "HUGEINT in DuckDB, and pandas-layer clients render HUGEINT "
        "as float64 ('100000.0') while Spark ships int64 — every "
        "declared output is now BIGINT/BOOLEAN on both engines. The "
        "only ordered pass is a 24-row cumulative window off the "
        "hour rollup (SURVEY §2.H)."
    ),
)
def ks_uniform_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(F.hour("ts").alias("h")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    cal = spark.range(24).select(F.col("id").cast("int").alias("h"))
    f = cal.join(hc, "h", "left").select(
        "h", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = f.select(
        "h",
        F.sum("c").over(Window.orderBy("h")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    s = w.agg(
        F.max(F.abs(24 * F.col("cum") - (F.col("h") + 1) * F.col("n"))).alias("d_int"),
        F.max("n").alias("n"),
    )
    lhs = F.expr("CAST(1000 * d_int AS DECIMAL(19,0))")
    return s.select(
        F.col("n").cast("bigint").alias("n_events"),
        # DECIMAL(38,0) operands: 10^6*d_int overflows BIGINT once
        # n > ~4e11 (d_int <= 24n), i.e. exactly at the 100 TB target
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * d_int)"
            " div (CAST(24 AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("d_stat_micro"),
        # squared KS statistic in exact e6 integer units: 10^6*d_int^2
        # tops out at ~5.8e35 for n=1e12 (d_int <= 24n) — inside
        # DECIMAL(38,0) at the 100 TB target
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * d_int * d_int)"
            " div (CAST(576 AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("ks_sq_e6"),
        (lhs * lhs > F.lit(1062238464).cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)")).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# holt_linear_forecast — double exponential smoothing on the daily series.
# ---------------------------------------------------------------------------

_HOLT_ALPHA, _HOLT_BETA, _HOLT_H = 0.3, 0.1, 7

# one smoothing step as a shared expression template: l' = a*x + (1-a)(l+b),
# b' = beta*(l' - l) + (1-beta)*b, with l' re-derived textually inside b'
# so both engines run the identical IEEE op tree
def _holt_step(acc_l: str, acc_b: str, x: str) -> tuple[str, str]:
    lnew = (
        f"(CAST({_HOLT_ALPHA} AS DOUBLE) * {x}"
        f" + (CAST(1 AS DOUBLE) - CAST({_HOLT_ALPHA} AS DOUBLE))"
        f" * ({acc_l} + {acc_b}))"
    )
    bnew = (
        f"(CAST({_HOLT_BETA} AS DOUBLE) * ({lnew} - {acc_l})"
        f" + (CAST(1 AS DOUBLE) - CAST({_HOLT_BETA} AS DOUBLE)) * {acc_b})"
    )
    return lnew, bnew


@register(
    "holt_linear_forecast",
    # accumulator is a 2-list [level, trend], NOT a struct: DuckDB
    # 1.0's list_reduce mis-evaluates multi-field STRUCT accumulators
    # across iterations (verified: single application correct, chained
    # fold drifts); list accumulators fold correctly in both engines
    oracle=(lambda: (lambda lnew, bnew: f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
),
arr AS (SELECT list(n ORDER BY d) AS ys, COUNT(*) AS nd FROM daily),
fit AS (
  SELECT nd,
         list_reduce(
           list_prepend(
             [ys[1], ys[2] - ys[1]],
             list_transform(ys[3:], v -> [CAST(v AS DOUBLE), CAST(0 AS DOUBLE)])),
           (acc, x) -> [{lnew}, {bnew}]) AS st
  FROM arr
)
SELECT CAST(nd AS BIGINT) AS n_days,
       ROUND(st[1], 4) AS level,
       ROUND(st[2], 4) AS trend,
       ROUND(st[1] + {_HOLT_H} * st[2], 4) AS forecast_7d
FROM fit
""")(*_holt_step("acc[1]", "acc[2]", "x[1]")))(),
    doc=(
        "Holt's linear-trend double exponential smoothing of the daily "
        "event counts (alpha=0.3, beta=0.1, classic init l1=y1, "
        "b1=y2-y1) with the h=7 forecast l+7b — the trend-aware "
        "forecaster next to seasonal_forecast's weekday-profile model "
        "and ewma_anomaly's level-only filter. The recursion is a "
        "SEQUENTIAL fold, so it runs as one higher-order fold over the "
        "day-ordered array (O(days) state, dimension-sized at any "
        "corpus scale — the timeseries.py contract); the per-step op "
        "tree is one shared expression template in both engines, so "
        "the smoothed state is bit-identical with no per-step "
        "rounding. BOUND: after the distributed daily rollup the "
        "series collapses to ONE array folded in ONE task — O(days) "
        "memory and work, ~37 KB/century of doubles; the bound grows "
        "with calendar time, never with corpus size (SURVEY §4) "
        "(SURVEY §2.H)."
    ),
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("n")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("n")))),
            lambda st: st["n"],
        ).alias("ys"),
        F.count("*").alias("nd"),
    )
    # NB: Spark [] subscripts are 0-based (DuckDB's are 1-based)
    lnew, bnew = _holt_step("acc[0]", "acc[1]", "x")
    fit = arr.select(
        "nd",
        F.expr(
            f"aggregate(slice(ys, 3, greatest(size(ys) - 2, 0)),"
            f" array(ys[0], ys[1] - ys[0]),"
            f" (acc, x) -> array({lnew}, {bnew}))"
        ).alias("st"),
    )
    return fit.select(
        F.col("nd").cast("bigint").alias("n_days"),
        F.round(F.expr("st[0]"), 4).alias("level"),
        F.round(F.expr("st[1]"), 4).alias("trend"),
        F.round(F.expr("st[0]") + _HOLT_H * F.expr("st[1]"), 4).alias("forecast_7d"),
    )


# ---------------------------------------------------------------------------
# iqr_outlier_days — Tukey-fence outlier days, exact integer quartiles.
# ---------------------------------------------------------------------------


@register(
    "iqr_outlier_days",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
rk AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn, COUNT(*) OVER () AS n
  FROM daily
),
pick AS (
  SELECT MAX(n) AS n,
         MAX(CASE WHEN rn = (n - 1) // 4 + 1 THEN c END) AS y1,
         MAX(CASE WHEN rn = (n - 1) // 4 + 2 THEN c END) AS y1p,
         MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 1 THEN c END) AS y3,
         MAX(CASE WHEN rn = (3 * (n - 1)) // 4 + 2 THEN c END) AS y3p
  FROM rk
),
q AS (
  SELECT n,
         4 * y1 + ((n - 1) % 4) * (COALESCE(y1p, y1) - y1) AS q1x4,
         4 * y3 + ((3 * (n - 1)) % 4) * (COALESCE(y3p, y3) - y3) AS q3x4
  FROM pick
)
SELECT CAST(q.n AS BIGINT) AS n_days,
       CAST(q1x4 AS BIGINT) AS q1_x4,
       CAST(q3x4 AS BIGINT) AS q3_x4,
       CAST(q3x4 - q1x4 AS BIGINT) AS iqr_x4,
       CAST(SUM(CASE WHEN 8 * daily.c < 2 * q1x4 - 3 * (q3x4 - q1x4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN 8 * daily.c > 2 * q3x4 + 3 * (q3x4 - q1x4)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM daily CROSS JOIN q
GROUP BY q.n, q1x4, q3x4
""",
    doc=(
        "Tukey-fence outlier screen on the daily event counts: "
        "linear-interpolated quartiles kept EXACT as 4x integers "
        "(the interpolation fraction at (n-1)/4 is always a quarter, "
        "so 4*Q is integer), fences compared as the cross-multiplied "
        "integer predicates 8c < 2*Q1x4 - 3*IQRx4 / 8c > 2*Q3x4 + "
        "3*IQRx4 — no float ever materializes, no percentile-"
        "interpolation knife edge between engines. The box-plot "
        "robust alternative to anomaly_zscore's mean/std gates "
        "(which an outlier inflates) and the global-series companion "
        "to robust_zscore_mad. All windows run over the O(days) "
        "rollup (SURVEY §2.H)."
    ),
)
def iqr_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    rk = daily.select(
        "c",
        F.row_number().over(Window.orderBy("c")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    pick = rk.agg(
        F.max("n").alias("n"),
        F.max(F.when(F.expr("rn = (n - 1) div 4 + 1"), F.col("c"))).alias("y1"),
        F.max(
            F.when(F.expr("rn = (n - 1) div 4 + 2"), F.col("c"))
        ).alias("y1p"),
        F.max(
            F.when(F.expr("rn = (3 * (n - 1)) div 4 + 1"), F.col("c"))
        ).alias("y3"),
        F.max(
            F.when(F.expr("rn = (3 * (n - 1)) div 4 + 2"), F.col("c"))
        ).alias("y3p"),
    ).select(
        "n",
        F.expr("4 * y1 + ((n - 1) % 4) * (COALESCE(y1p, y1) - y1)").alias("q1x4"),
        F.expr("4 * y3 + ((3 * (n - 1)) % 4) * (COALESCE(y3p, y3) - y3)").alias(
            "q3x4"
        ),
    )
    return (
        daily.crossJoin(F.broadcast(pick))
        .groupBy("n", "q1x4", "q3x4")
        .agg(
            F.sum(
                F.when(
                    8 * F.col("c") < 2 * F.col("q1x4") - 3 * (F.col("q3x4") - F.col("q1x4")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_low_outliers"),
            F.sum(
                F.when(
                    8 * F.col("c") > 2 * F.col("q3x4") + 3 * (F.col("q3x4") - F.col("q1x4")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_high_outliers"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("q1x4").cast("bigint").alias("q1_x4"),
            F.col("q3x4").cast("bigint").alias("q3_x4"),
            (F.col("q3x4") - F.col("q1x4")).cast("bigint").alias("iqr_x4"),
            "n_low_outliers",
            "n_high_outliers",
        )
    )


# ---------------------------------------------------------------------------
# deseasonalized_acf — autocorrelation AFTER removing the weekday rhythm.
# ---------------------------------------------------------------------------

_DESEAS_MAX_LAG = 7


def _deseas_oracle() -> str:
    leads = ", ".join(
        f"LEAD(r, {k}) OVER (ORDER BY day_idx) AS l{k}"
        for k in range(1, _DESEAS_MAX_LAG + 1)
    )
    arms = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, r * l{k} AS prod, l{k} IS NOT NULL AS ok FROM w"
        for k in range(1, _DESEAS_MAX_LAG + 1)
    )
    return f"""
WITH d AS (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (
  SELECT (day_idx + 4) % 7 AS wd,
         CAST(SUM(c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS m
  FROM d GROUP BY 1
),
gm AS (
  SELECT wd, CAST((2 * s * 1000000 + m) // (2 * m) AS BIGINT) AS mean_micro
  FROM g
),
res AS (
  SELECT d.day_idx,
         CAST(d.c * 1000000 - gm.mean_micro AS DECIMAL(19,0)) AS r
  FROM d JOIN gm ON (d.day_idx + 4) % 7 = gm.wd
),
w AS (SELECT day_idx, r, {leads} FROM res),
den AS (SELECT SUM(r * r) AS dd FROM res),
arms AS ({arms}),
agg AS (
  SELECT lag,
         SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_pairs,
         SUM(CASE WHEN ok THEN prod ELSE CAST(0 AS DECIMAL(38,0)) END) AS sp
  FROM arms GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(CASE WHEN dd = 0 THEN 0
            WHEN sp >= 0 THEN (1000000::HUGEINT * CAST(sp AS HUGEINT))
                             // CAST(dd AS HUGEINT)
            ELSE -((1000000::HUGEINT * CAST(-sp AS HUGEINT))
                   // CAST(dd AS HUGEINT))
       END AS BIGINT) AS acf_micro
FROM agg CROSS JOIN den ORDER BY lag
"""


@register(
    "deseasonalized_acf",
    oracle=_deseas_oracle(),
    doc=(
        "Autocorrelation of the WEEKDAY-DESEASONALIZED daily series "
        "(lags 1-7): acf_daily on raw counts mostly re-detects the "
        "weekly rhythm; subtracting each day's weekday mean first "
        "answers the question that matters for anomaly baselines — "
        "is there structure BEYOND the weekly cycle (trend momentum, "
        "multi-day bursts)? A flat deseasonalized ACF certifies "
        "ewma_anomaly's weekday-blind residual assumption. Residuals "
        "are exact micro-unit integers (c*1e6 - weekday mean-micro, "
        "the half-away-from-zero integer mean), lag products "
        "accumulate in DECIMAL, and acf ships as pure-integer "
        "acf_micro = (10^6*sp) div dd with the sign split out (no "
        "final ROUND(double)); one O(days) LEAD pass — the acf_daily "
        "scale shape with a 7-row weekday dim join in front "
        "(SURVEY §2.H)."
    ),
)
def deseasonalized_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 1000000 div 86400"
            ).alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    g = d.groupBy(((F.col("day_idx") + 4) % 7).alias("wd")).agg(
        F.sum("c").cast("bigint").alias("s"), F.count("*").cast("bigint").alias("m")
    )
    gm = g.select(
        "wd",
        F.expr("(2 * s * 1000000 + m) div (2 * m)").cast("bigint").alias(
            "mean_micro"
        ),
    )
    res = (
        d.join(F.broadcast(gm), ((F.col("day_idx") + 4) % 7) == F.col("wd"))
        .select(
            "day_idx",
            (F.col("c") * 1000000 - F.col("mean_micro"))
            .cast("decimal(19,0)")
            .alias("r"),
        )
    )
    # lag arms via ONE posexplode over the lead row (acf_daily shape),
    # not a 7-way union — a union re-derives the residual lineage per
    # arm (7x the scans in the plan)
    w_ord = Window.orderBy("day_idx")
    leads = res.select(
        "r",
        *[
            F.lead("r", k).over(w_ord).alias(f"l{k}")
            for k in range(1, _DESEAS_MAX_LAG + 1)
        ],
    )
    den = res.agg(F.sum(F.col("r") * F.col("r")).alias("dd"))
    arms = leads.select(
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        (F.col("r") * F.col(f"l{k}")).alias("prod"),
                        F.col(f"l{k}").isNotNull().alias("ok"),
                    )
                    for k in range(1, _DESEAS_MAX_LAG + 1)
                ]
            )
        ).alias("pos", "a")
    ).select((F.col("pos") + 1).alias("lag"), "a.prod", "a.ok")
    return (
        arms.groupBy(F.col("lag").cast("int").alias("lag"))
        .agg(
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("ok"), F.col("prod")).otherwise(0)).alias("sp"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            # sp and dd are exact DECIMAL sums; the quotient ships as
            # pure-integer micro-units with sign split out so both
            # engines truncate identically on negatives (no final
            # ROUND(double), the r8 halfway hazard)
            F.expr(
                "CAST(CASE WHEN dd = 0 THEN 0"
                " WHEN sp >= 0 THEN (CAST(1000000 AS DECIMAL(38,0)) * sp) div dd"
                " ELSE -((CAST(1000000 AS DECIMAL(38,0)) * (-sp)) div dd)"
                " END AS BIGINT)"
            ).alias("acf_micro"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# friedman_weekday — is the weekday effect consistent across weeks?
# ---------------------------------------------------------------------------


@register(
    "friedman_weekday",
    oracle="""
WITH d AS (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
wk AS (
  SELECT day_idx // 7 AS week, (day_idx + 4) % 7 AS wd, c,
         COUNT(*) OVER (PARTITION BY day_idx // 7) AS wdays
  FROM d
),
full_weeks AS (SELECT week, wd, c FROM wk WHERE wdays = 7),
rk AS (
  SELECT week, wd,
         2 * (RANK() OVER (PARTITION BY week ORDER BY c) - 1)
           + COUNT(*) OVER (PARTITION BY week, c) + 1 AS r2
  FROM full_weeks
),
g AS (
  SELECT wd, CAST(SUM(r2) AS BIGINT) AS r2sum,
         CAST(COUNT(*) AS BIGINT) AS nblocks
  FROM rk GROUP BY wd
),
s AS (
  SELECT MAX(nblocks) AS n,
         CAST(SUM(CAST(r2sum AS DECIMAL(38,0)) * r2sum) AS DECIMAL(38,0)) AS q2
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_weeks,
       CAST(7 AS BIGINT) AS k_weekdays,
       CAST((3000000 * CAST(q2 AS BIGINT)) // (56 * n) - 24000000 * n
            AS BIGINT) AS friedman_chi2_micro,
       30000 * CAST(q2 AS BIGINT) > (125916 + 240000 * n) * (56 * n)
         AS reject_95
FROM s
""",
    doc=(
        "Friedman rank test with weeks as blocks: rank the 7 weekdays "
        "WITHIN each complete week, then test whether the weekday "
        "rank profile is consistent — the nonparametric repeated-"
        "measures complement to weekday_anova (which pools all days "
        "and can be fooled by a few huge weeks; Friedman asks if the "
        "weekly SHAPE itself repeats). Average ranks stay exact "
        "integers via the doubled form 2r = 2(rank-1) + ties + 1 "
        "(mannwhitney convention inside 7-row partitions); "
        "chi2_F = 12/(n k(k+1)) * sum(R_j^2) - 3n(k+1) is evaluated "
        "on the 2x sums as 3*sum(R2_j^2)/(n*7*8) - 3n*8, shipped as "
        "pure-integer friedman_chi2_micro with reject_95 the exact "
        "cross-multiplication (no final ROUND(double)); dof=6 "
        "critical 12.5916. Incomplete edge weeks are excluded "
        "(standard complete-block requirement). All windows run "
        "over the O(days) rollup (SURVEY §2.H)."
    ),
)
def friedman_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 1000000 div 86400"
            ).alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wk = d.select(
        F.expr("day_idx div 7").alias("week"),
        ((F.col("day_idx") + 4) % 7).alias("wd"),
        "c",
        F.count("*").over(Window.partitionBy(F.expr("day_idx div 7"))).alias("wdays"),
    )
    full_weeks = wk.where(F.col("wdays") == 7).select("week", "wd", "c")
    rk = full_weeks.select(
        "week",
        "wd",
        (
            2 * (F.rank().over(Window.partitionBy("week").orderBy("c")) - 1)
            + F.count("*").over(Window.partitionBy("week", "c"))
            + 1
        ).alias("r2"),
    )
    g = rk.groupBy("wd").agg(
        F.sum("r2").cast("bigint").alias("r2sum"),
        F.count("*").cast("bigint").alias("nblocks"),
    )
    s = g.agg(
        F.max("nblocks").alias("n"),
        F.sum(F.col("r2sum").cast("decimal(38,0)") * F.col("r2sum")).alias("q2"),
    )
    # q2 and n are exact integers bounded by CALENDAR time (q2 <=
    # 2800*weeks^2), so plain BIGINT arithmetic holds at any corpus
    # scale; chi2 ships as pure-integer micro-units and reject_95 as
    # the cross-multiplication 3*q2*10^4 > (125916 + 240000n)*56n —
    # no final ROUND(double), the r8 halfway hazard
    return s.select(
        F.col("n").cast("bigint").alias("n_weeks"),
        F.lit(7).cast("bigint").alias("k_weekdays"),
        F.expr(
            "CAST((3000000 * CAST(q2 AS BIGINT)) div (56 * n)"
            " - 24000000 * n AS BIGINT)"
        ).alias("friedman_chi2_micro"),
        F.expr(
            "30000 * CAST(q2 AS BIGINT) > (125916 + 240000 * n) * (56 * n)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# burst_days_kleinberg — two-state burst model over the daily series.
# ---------------------------------------------------------------------------

_BURST_S = 2.0     # burst-state rate multiplier
_BURST_INF = 1e18  # "cannot start in burst" sentinel cost


def _burst_step(a0: str, n0: str, a1: str, n1: str, x: str) -> tuple[str, ...]:
    """One Viterbi step of the 2-state automaton, as shared expression
    templates (lam0/lam1/tcost are in-scope column references):
    base-state and burst-state best costs plus the burst-day count
    carried along each best path."""
    cost0 = f"(lam0 - {x} * ln(lam0))"
    cost1 = f"(lam1 - {x} * ln(lam1))"
    return (
        f"(LEAST({a0}, {a1}) + {cost0})",
        f"(CASE WHEN {a0} <= {a1} THEN {n0} ELSE {n1} END)",
        f"(LEAST({a0} + tcost, {a1}) + {cost1})",
        f"((CASE WHEN {a0} + tcost <= {a1} THEN {n0} ELSE {n1} END)"
        f" + CAST(1 AS DOUBLE))",
    )


@register(
    "burst_days_kleinberg",
    oracle=(lambda: (lambda s0, s1, s2, s3: f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
),
arr AS (
  SELECT list(c ORDER BY d) AS ys, CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(c) AS DOUBLE) AS n
  FROM daily
),
prm AS (
  SELECT ys, nd, n / nd AS lam0, {_BURST_S} * (n / nd) AS lam1,
         ln(CAST(nd AS DOUBLE)) AS tcost
  FROM arr
),
fit AS (
  SELECT nd, lam0, lam1,
         list_reduce(
           list_prepend(
             [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), {_BURST_INF}, CAST(0 AS DOUBLE)],
             list_transform(ys, v -> [v, CAST(0 AS DOUBLE),
                                      CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
           (acc, x) -> [{s0}, {s1}, {s2}, {s3}]) AS st
  FROM prm
)
SELECT nd AS n_days,
       CAST(CASE WHEN st[1] <= st[3] THEN st[2] ELSE st[4] END AS BIGINT)
           AS n_burst_days,
       CAST(CAST(CASE WHEN st[1] <= st[3] THEN st[2] ELSE st[4] END AS BIGINT)
            * 10000 // nd AS BIGINT) AS burst_share_bps
FROM fit
""")(*_burst_step("acc[1]", "acc[2]", "acc[3]", "acc[4]", "x[1]")))(),
    doc=(
        "Kleinberg-style two-state burst detection on the daily event "
        "counts (Kleinberg 2002, batch variant): a Viterbi pass over "
        "a base-rate state and a 2x-rate burst state with Poisson "
        "negative-log-likelihood emission costs (the shared ln(c!) "
        "term cancels between states) and a ln(D) entry toll — "
        "reports how many days the OPTIMAL state path spends in "
        "burst. The principled burstiness read next to "
        "poisson_dispersion_daily's single dispersion index and "
        "error_bursts' fixed thresholds. The recursion is ONE "
        "higher-order fold over the day-ordered array (holt's 4-list "
        "accumulator pattern: two state costs + the burst-day count "
        "carried along each best path), identical op trees in both "
        "engines; the outputs are the INTEGER decision columns only "
        "(the raw double path cost was dropped in r10: the r9 "
        "ks_stat red proved shared IEEE op trees are not env-stable "
        "as outputs) — ties broken toward the base state "
        "(SURVEY §2.H)."
    ),
)
def burst_days_kleinberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("c")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("c")))),
            lambda st: st["c"],
        ).alias("ys"),
        F.count("*").cast("bigint").alias("nd"),
        F.sum("c").cast("double").alias("n"),
    )
    prm = arr.select(
        "ys",
        "nd",
        (F.col("n") / F.col("nd")).alias("lam0"),
        (F.lit(_BURST_S) * (F.col("n") / F.col("nd"))).alias("lam1"),
        F.log(F.col("nd").cast("double")).alias("tcost"),
    )
    # NB: Spark [] subscripts are 0-based (DuckDB's are 1-based)
    s0, s1, s2, s3 = _burst_step("acc[0]", "acc[1]", "acc[2]", "acc[3]", "x")
    fit = prm.select(
        "nd",
        F.expr(
            f"aggregate(ys,"
            f" array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
            f"       CAST({_BURST_INF} AS DOUBLE), CAST(0 AS DOUBLE)),"
            f" (acc, x) -> array({s0}, {s1}, {s2}, {s3}))"
        ).alias("st"),
    )
    nburst = F.expr(
        "CAST(CASE WHEN st[0] <= st[2] THEN st[1] ELSE st[3] END AS BIGINT)"
    )
    return fit.select(
        F.col("nd").alias("n_days"),
        nburst.alias("n_burst_days"),
        F.expr(
            "CAST(CASE WHEN st[0] <= st[2] THEN st[1] ELSE st[3] END AS BIGINT)"
            " * 10000 div nd"
        )
        .cast("bigint")
        .alias("burst_share_bps"),
    )


# ---------------------------------------------------------------------------
# discord_weeks — matrix-profile discord discovery over weekly windows.
# ---------------------------------------------------------------------------

_DISCORD_W = 7    # window length (days)
_DISCORD_TOP = 3  # discords reported


def _disc_fold_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {_DISCORD_W} + 1), "
        f"i -> {expr})), (a, b) -> a + b)"
    )


@register(
    "discord_weeks",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
),
arr AS (SELECT list(c ORDER BY d) AS ys, CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
win AS (
  SELECT s.s, arr.ys[s.s:s.s + {_DISCORD_W} - 1] AS w
  FROM arr CROSS JOIN (SELECT UNNEST(range(1, (SELECT nd FROM arr) - {_DISCORD_W} + 2)) AS s) s
),
zn AS (
  SELECT s,
         list_transform(w, x -> CASE
           WHEN sqrt({_disc_fold_sql('(w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W}) * (w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W})')} / {_DISCORD_W}) = 0
           THEN 0.0
           ELSE (x - ({_disc_fold_sql('w[i]')}) / {_DISCORD_W})
                / sqrt({_disc_fold_sql('(w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W}) * (w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W})')} / {_DISCORD_W})
         END) AS z
  FROM win
),
pairs AS (
  SELECT a.s,
         sqrt({_disc_fold_sql('(a.z[i] - b.z[i]) * (a.z[i] - b.z[i])')}) AS dist
  FROM zn a JOIN zn b ON ABS(a.s - b.s) >= {_DISCORD_W}
),
prof AS (SELECT s, MIN(dist) AS profile FROM pairs GROUP BY s)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY profile DESC, s) AS BIGINT) AS rank,
       CAST(s AS BIGINT) AS start_day_index
FROM prof
ORDER BY profile DESC, s LIMIT {_DISCORD_TOP}
""",
    doc=(
        "Matrix-profile discord discovery over z-normalized 7-day "
        "windows of the daily series (Yeh et al. 2016, ICDM): each "
        "window's profile = distance to its nearest NON-OVERLAPPING "
        "neighbor window; the windows whose nearest neighbor is "
        "farthest are the discords — the weeks shaped like no other "
        "week, the anomaly primitive that finds what threshold "
        "detectors (anomaly_zscore, iqr_outlier_days) structurally "
        "cannot: a normal-volume week with an abnormal SHAPE. "
        "Everything runs over the O(days) rollup: ~|days| windows, "
        "z-normalization and distances as ordered sequential folds "
        "(identical op trees both engines, sd=0 windows map to zero "
        "vectors); the OUTPUT is the integer (rank, start index) "
        "decision only — the raw double distance was dropped in r10 "
        "(the r9 ks_stat red proved shared IEEE trees are not "
        "env-stable as outputs; selection margins are macroscopic "
        "and ties break on the integer index). The window-pair join "
        "is dimension-sized by "
        "construction, top-3 via the profile ranking. BOUND: after "
        "the distributed daily rollup the series collapses to ONE "
        "array built in ONE task, and the pair space is O(days^2) "
        "over that dimension table (~13 M pairs/decade) — both grow "
        "with calendar time, never with corpus size (SURVEY §4) "
        "(SURVEY §2.H)."
    ),
)
def discord_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("c")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("c")))),
            lambda st: st["c"],
        ).alias("ys"),
        F.count("*").cast("bigint").alias("nd"),
    )
    win = arr.select(
        F.explode(
            F.sequence(F.lit(1), F.col("nd").cast("int") - _DISCORD_W + 1)
        ).alias("s"),
        F.col("ys"),
    ).select("s", F.expr(f"slice(ys, s, {_DISCORD_W})").alias("w"))
    mean_sql = f"aggregate(w, 0D, (a, x) -> a + x) / {_DISCORD_W}"
    var_sql = (
        f"aggregate(w, 0D, (a, x) -> a + (x - ({mean_sql})) * (x - ({mean_sql})))"
        f" / {_DISCORD_W}"
    )
    zn = win.select(
        "s",
        F.expr(
            f"transform(w, x -> CASE WHEN sqrt({var_sql}) = 0 THEN 0.0"
            f" ELSE (x - ({mean_sql})) / sqrt({var_sql}) END)"
        ).alias("z"),
    )
    a = zn.select(F.col("s"), F.col("z"))
    bz = zn.select(F.col("s").alias("t"), F.col("z").alias("zt"))
    pairs = (
        a.crossJoin(F.broadcast(bz))
        .where(F.abs(F.col("s") - F.col("t")) >= _DISCORD_W)
        .select(
            "s",
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(z, zt, (x, y) -> (x - y) * (x - y)),"
                    " 0D, (a, b) -> a + b)"
                )
            ).alias("dist"),
        )
    )
    prof = pairs.groupBy("s").agg(F.min("dist").alias("profile"))
    wrank = Window.orderBy(F.desc("profile"), "s")
    return (
        prof.orderBy(F.desc("profile"), "s")
        .limit(_DISCORD_TOP)
        .withColumn("rank", F.row_number().over(wrank).cast("bigint"))
        .select(
            "rank",
            F.col("s").cast("bigint").alias("start_day_index"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# motif_weeks — the recurring-shape twin of discord_weeks.
# ---------------------------------------------------------------------------


@register(
    "motif_weeks",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
),
arr AS (SELECT list(c ORDER BY d) AS ys, CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
win AS (
  SELECT s.s, arr.ys[s.s:s.s + {_DISCORD_W} - 1] AS w
  FROM arr CROSS JOIN (SELECT UNNEST(range(1, (SELECT nd FROM arr) - {_DISCORD_W} + 2)) AS s) s
),
zn AS (
  SELECT s,
         list_transform(w, x -> CASE
           WHEN sqrt({_disc_fold_sql('(w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W}) * (w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W})')} / {_DISCORD_W}) = 0
           THEN 0.0
           ELSE (x - ({_disc_fold_sql('w[i]')}) / {_DISCORD_W})
                / sqrt({_disc_fold_sql('(w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W}) * (w[i] - (' + _disc_fold_sql('w[i]') + f') / {_DISCORD_W})')} / {_DISCORD_W})
         END) AS z
  FROM win
),
pairs AS (
  SELECT a.s AS s1, b.s AS s2,
         sqrt({_disc_fold_sql('(a.z[i] - b.z[i]) * (a.z[i] - b.z[i])')}) AS dist
  FROM zn a JOIN zn b ON b.s - a.s >= {_DISCORD_W}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist, s1, s2) AS BIGINT) AS rank,
       CAST(s1 AS BIGINT) AS start_day_a,
       CAST(s2 AS BIGINT) AS start_day_b
FROM pairs
ORDER BY dist, s1, s2 LIMIT {_DISCORD_TOP}
""",
    doc=(
        "Matrix-profile motif discovery: the top-3 CLOSEST pairs of "
        "non-overlapping z-normalized 7-day windows — the recurring "
        "shapes of the series (the repeated launch-week or "
        "incident-recovery signature), the complement of "
        "discord_weeks' loners from the same machinery (Yeh et al. "
        "2016). Identical ordered-fold z-normalization and distance "
        "op trees; the OUTPUT is the integer (rank, start-pair) "
        "decision only (raw double distance dropped in r10, the "
        "ks_stat lesson); the pair stream keeps only s2 - s1 >= "
        "window so each unordered pair appears once; top-3 via "
        "TakeOrderedAndProject over the dimension-sized pair table. "
        "BOUND: same as discord_weeks — the daily series collapses "
        "to ONE array in ONE task after the distributed rollup, pair "
        "space O(days^2) over the dimension table; calendar-bounded, "
        "corpus-independent (SURVEY §4) (SURVEY §2.H)."
    ),
)
def motif_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("c")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("c")))),
            lambda st: st["c"],
        ).alias("ys"),
        F.count("*").cast("bigint").alias("nd"),
    )
    win = arr.select(
        F.explode(
            F.sequence(F.lit(1), F.col("nd").cast("int") - _DISCORD_W + 1)
        ).alias("s"),
        F.col("ys"),
    ).select("s", F.expr(f"slice(ys, s, {_DISCORD_W})").alias("w"))
    mean_sql = f"aggregate(w, 0D, (a, x) -> a + x) / {_DISCORD_W}"
    var_sql = (
        f"aggregate(w, 0D, (a, x) -> a + (x - ({mean_sql})) * (x - ({mean_sql})))"
        f" / {_DISCORD_W}"
    )
    zn = win.select(
        "s",
        F.expr(
            f"transform(w, x -> CASE WHEN sqrt({var_sql}) = 0 THEN 0.0"
            f" ELSE (x - ({mean_sql})) / sqrt({var_sql}) END)"
        ).alias("z"),
    )
    a = zn.select(F.col("s").alias("s1"), F.col("z"))
    bz = zn.select(F.col("s").alias("s2"), F.col("z").alias("zt"))
    pairs = (
        a.crossJoin(F.broadcast(bz))
        .where(F.col("s2") - F.col("s1") >= _DISCORD_W)
        .select(
            "s1",
            "s2",
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(z, zt, (x, y) -> (x - y) * (x - y)),"
                    " 0D, (a, b) -> a + b)"
                )
            ).alias("dist"),
        )
    )
    wrank = Window.orderBy("dist", "s1", "s2")
    return (
        pairs.orderBy("dist", "s1", "s2")
        .limit(_DISCORD_TOP)
        .withColumn("rank", F.row_number().over(wrank).cast("bigint"))
        .select(
            "rank",
            F.col("s1").cast("bigint").alias("start_day_a"),
            F.col("s2").cast("bigint").alias("start_day_b"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift + Holt-Winters seasonal forecast (round 8): two
# more members of the single-array sequential-fold family (same
# BOUND as holt_linear_forecast: the corpus-sized work is the daily
# rollup; the day-ordered series then collapses to ONE array folded in
# ONE task — O(days), calendar-bounded, corpus-independent).
# ---------------------------------------------------------------------------

_PH_DELTA, _PH_LAMBDA = 0.005, 0.1


def _ph_step(acc, x: str, nd: str, total: str) -> list[str]:
    """Shared Page-Hinkley step template: acc is an engine-specific
    1-based index formatter (Spark shifts to 0-based), x the raw daily
    count expr. State = [n, sum, m, min_m, alarm_day]; the mean-share
    normalization x*nd/total makes the statistic scale-free."""
    xn = f"({x} * {nd} / {total})"
    n1 = f"({acc(1)} + 1)"
    s1 = f"({acc(2)} + {xn})"
    m1 = f"({acc(3)} + ({xn} - (({s1}) / ({n1})) - CAST({_PH_DELTA} AS DOUBLE)))"
    minm1 = f"least({acc(4)}, {m1})"
    alarm1 = (
        f"CASE WHEN {acc(5)} >= 0 THEN {acc(5)} "
        f"WHEN (({m1}) - ({minm1})) > CAST({_PH_LAMBDA} AS DOUBLE) "
        f"THEN {n1} ELSE CAST(-1 AS DOUBLE) END"
    )
    return [n1, s1, m1, minm1, alarm1]


def _ph_oracle() -> str:
    acc = lambda i: f"acc[{i}]"  # noqa: E731
    st = ",\n        ".join(_ph_step(acc, "e[1]", "nd", "total"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
),
arr AS (SELECT list(c ORDER BY d) AS ys, CAST(COUNT(*) AS BIGINT) AS nd,
               SUM(c) AS total
        FROM daily),
fit AS (
  SELECT nd,
    list_reduce(
      list_prepend([CAST(0 AS DOUBLE), 0, 0, 0, -1],
                   list_transform(ys, v -> [v, 0, 0, 0, 0])),
      (acc, e) -> [
        {st}
      ]) AS st
  FROM arr
)
SELECT CAST(nd AS BIGINT) AS n_days,
       ROUND(st[3] - st[4], 4) AS ph_stat,
       CAST(st[5] AS BIGINT) AS drift_day,
       CAST(CASE WHEN st[5] >= 0 THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM fit
"""


@register(
    "page_hinkley_drift",
    oracle=_ph_oracle(),
    doc=(
        f"Page-Hinkley sequential drift test on the daily event volume "
        f"(Page 1954; the streaming-drift standard in river/MOA): "
        f"cumulative deviation from the RUNNING mean m_t, alarm when "
        f"m_t - min(m) exceeds lambda={_PH_LAMBDA} (delta={_PH_DELTA}); "
        "counts are normalized to mean-shares (x*D/N) so the statistic "
        "is scale-free — the same corpus at 1000x volume gives the "
        "same curve. The recursion is a sequential fold over the "
        "day-ordered array (one shared step template in both engines, "
        "bit-identical state); reports the FIRST alarm day. BOUND: "
        "like holt_linear_forecast — distributed daily rollup, then "
        "ONE O(days) array folded in ONE task; calendar-bounded, "
        "corpus-independent (SURVEY §4) (SURVEY §2.H)."
    ),
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("c")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("c")))),
            lambda st: st["c"],
        ).alias("ys"),
        F.count("*").cast("bigint").alias("nd"),
        F.sum("c").alias("total"),  # integer-valued doubles: order-exact
    )
    acc = lambda i: f"acc[{i - 1}]"  # noqa: E731  (Spark is 0-based)
    st = ", ".join(_ph_step(acc, "x", "nd", "total"))
    fit = arr.select(
        "nd",
        F.expr(
            "aggregate(ys,"
            " array(cast(0 as double), 0d, 0d, 0d, -1d),"
            f" (acc, x) -> array({st}))"
        ).alias("st"),
    )
    return fit.select(
        F.col("nd").alias("n_days"),
        F.round(F.expr("st[2] - st[3]"), 4).alias("ph_stat"),
        F.expr("cast(st[4] as bigint)").alias("drift_day"),
        F.expr("cast(case when st[4] >= 0 then 1 else 0 end as bigint)").alias(
            "drifted"
        ),
    )


_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M = 0.3, 0.1, 0.2, 7


def _hw_step(l: str, b: str, s1: str, y: str) -> tuple[str, str, str]:
    """Shared Holt-Winters additive step: l/b/s1 are accumulator refs
    (s1 = the seasonal for the CURRENT day), y the observation; snew
    re-derives lnew textually so both engines run one IEEE op tree."""
    a, bb, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    lnew = (
        f"(CAST({a} AS DOUBLE) * ({y} - {s1})"
        f" + (CAST(1 AS DOUBLE) - CAST({a} AS DOUBLE)) * ({l} + {b}))"
    )
    bnew = (
        f"(CAST({bb} AS DOUBLE) * ({lnew} - {l})"
        f" + (CAST(1 AS DOUBLE) - CAST({bb} AS DOUBLE)) * {b})"
    )
    snew = (
        f"(CAST({g} AS DOUBLE) * ({y} - {lnew})"
        f" + (CAST(1 AS DOUBLE) - CAST({g} AS DOUBLE)) * {s1})"
    )
    return lnew, bnew, snew


def _hw_mean7(el) -> str:
    """Sequential 7-term mean (same op order both engines); el maps a
    1-based day index to the engine's array subscript."""
    s = el(1)
    for i in range(2, 8):
        s = f"({s} + {el(i)})"
    return f"({s} / 7)"


def _hw_oracle() -> str:
    m1 = _hw_mean7(lambda i: f"ys[{i}]")
    m2 = _hw_mean7(lambda i: f"ys[{i + 7}]")
    lnew, bnew, snew = _hw_step("acc[1]", "acc[2]", "acc[3]", "x[1]")
    rot = ", ".join(f"acc[{i}]" for i in range(4, 10))
    init_s = ", ".join(f"ys[{i}] - {m1}" for i in range(1, 8))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1
),
arr AS (SELECT list(n ORDER BY d) AS ys, CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
fit AS (
  SELECT nd,
         list_reduce(
           list_prepend(
             [{m1}, ({m2} - {m1}) / 7, {init_s}],
             list_transform(ys[15:], v -> [CAST(v AS DOUBLE), 0, 0, 0, 0, 0, 0, 0, 0])),
           (acc, x) -> [{lnew}, {bnew}, {rot}, {snew}]) AS st
  FROM arr WHERE nd >= 15
)
SELECT CAST(nd AS BIGINT) AS n_days,
       ROUND(st[1], 4) AS level,
       ROUND(st[2], 4) AS trend,
       ROUND(st[3], 4) AS seasonal_next,
       ROUND(st[1] + 7 * st[2] + st[9], 4) AS forecast_7d
FROM fit
"""


@register(
    "holt_winters_forecast",
    oracle=_hw_oracle(),
    doc=(
        f"Holt-Winters ADDITIVE triple exponential smoothing of daily "
        f"event counts (alpha={_HW_ALPHA}, beta={_HW_BETA}, "
        f"gamma={_HW_GAMMA}, weekly season m={_HW_M}; classic init "
        "l=mean(week1), b=(mean(week2)-mean(week1))/7, s_i=y_i-l): "
        "completes the smoothing ladder — ewma (level), "
        "holt_linear_forecast (level+trend), this (level+trend+"
        "season) — and forecasts h=7 as l + 7b + s. The 9-value state "
        "[l, b, s1..s7] rides a single higher-order fold with the "
        "seasonal ring rotated per step; one shared step template in "
        "both engines (lnew re-derived textually inside bnew/snew), so "
        "the state is bit-identical with no per-step rounding. The "
        "DuckDB side uses a LIST accumulator — multi-field STRUCT "
        "accumulators mis-evaluate across list_reduce iterations in "
        "DuckDB 1.0 (holt_linear_forecast's documented finding). "
        "BOUND: distributed daily rollup, then ONE O(days) array in "
        "ONE task; calendar-bounded, corpus-independent (SURVEY §4) "
        "(SURVEY §2.H)."
    ),
)
def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("n")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("n")))),
            lambda st: st["n"],
        ).alias("ys"),
        F.count("*").cast("bigint").alias("nd"),
    ).where(F.col("nd") >= 15)
    # Spark [] subscripts are 0-based (DuckDB's are 1-based)
    m1 = _hw_mean7(lambda i: f"ys[{i - 1}]")
    m2 = _hw_mean7(lambda i: f"ys[{i + 6}]")
    lnew, bnew, snew = _hw_step("acc[0]", "acc[1]", "acc[2]", "x")
    rot = ", ".join(f"acc[{i}]" for i in range(3, 9))
    init_s = ", ".join(f"ys[{i - 1}] - {m1}" for i in range(1, 8))
    fit = arr.select(
        "nd",
        F.expr(
            f"aggregate(slice(ys, 15, greatest(size(ys) - 14, 0)),"
            f" array({m1}, ({m2} - {m1}) / 7, {init_s}),"
            f" (acc, x) -> array({lnew}, {bnew}, {rot}, {snew}))"
        ).alias("st"),
    )
    return fit.select(
        F.col("nd").alias("n_days"),
        F.round(F.expr("st[0]"), 4).alias("level"),
        F.round(F.expr("st[1]"), 4).alias("trend"),
        F.round(F.expr("st[2]"), 4).alias("seasonal_next"),
        F.round(F.expr("st[0] + 7 * st[1] + st[8]"), 4).alias("forecast_7d"),
    )


# ---------------------------------------------------------------------------
# grubbs_outlier_daily — single-outlier test on the daily count series.
# ---------------------------------------------------------------------------


@register(
    "grubbs_outlier_daily",
    oracle="""
WITH d AS (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS sm,
         CAST(SUM(c * c) AS BIGINT) AS sq
  FROM d
),
x AS (
  SELECT d.day_idx, ABS(s.n * d.c - s.sm) AS dev, s.n, s.sm, s.sq
  FROM d CROSS JOIN s
),
m AS (
  SELECT n, sm, sq, dev AS d_num, day_idx
  FROM x ORDER BY dev DESC, day_idx LIMIT 1
)
SELECT n AS n_days,
       CAST(day_idx AS BIGINT) AS peak_day_idx,
       CAST(d_num AS BIGINT) AS dev_num,
       CAST(CAST(n AS HUGEINT) * sq - CAST(sm AS HUGEINT) * sm
            AS VARCHAR) AS s2_num,
       CAST(CAST(d_num AS HUGEINT) * d_num * (n - 1) AS VARCHAR) AS g_sq_num,
       CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * sq - CAST(sm AS HUGEINT) * sm)
            AS VARCHAR) AS g_sq_den
FROM m
""",
    doc=(
        "Grubbs' single-outlier statistic on the daily event counts: "
        "G = max|x - mean| / s over the day rollup — the classical "
        "'is the most extreme day explainable by chance' read that "
        "complements iqr_outlier_days' quartile fences (IQR lists "
        "every fence-breaker; Grubbs scores THE most extreme one "
        "against the sample spread, which is what an on-call pages "
        "on). Computed entirely from the exact integers (n, sum, "
        "sumsq, D = max|n*x - sum|): dev_num ships as BIGINT; s2_num "
        "= n*sumsq - sum^2 — sm*sm passes BIGINT once total events "
        "exceed ~3e9 (ADVICE r9), so both engines square in "
        "HUGEINT/DECIMAL(38,0) — and G ships as the exact rational "
        "pair G^2 = g_sq_num/g_sq_den (dev^2*(n-1) over n*S2, exact "
        "at any corpus scale: numerator <= 1e36 at n=1e4 days x 1e12 "
        "events); the wide integers present as canonical digit "
        "STRINGS because decimal-typed output columns render as "
        "float64 in pandas-layer clients and hash-mismatch across "
        "engines (the r10 driver red, root-caused r11). No double "
        "output at all — the r9 ks_stat red proved shared IEEE op "
        "trees are not env-stable; sqrt(num/den) is the caller's "
        "last-mile op. The critical value depends on n through the "
        "t-quantile, so the decision is the caller's table lookup; "
        "argmax ties break to the earliest day. One distributed day "
        "rollup + a 1-row TakeOrdered head — calendar-bounded like "
        "the rest of §2.H."
    ),
)
def grubbs_outlier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 1000000 div 86400"
            ).alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    s = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sm"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    )
    x = d.crossJoin(F.broadcast(s)).select(
        "day_idx",
        F.abs(F.col("n") * F.col("c") - F.col("sm")).alias("dev"),
        "n",
        "sm",
        "sq",
    )
    m = x.orderBy(F.desc("dev"), "day_idx").limit(1)
    # all products in DECIMAL(38,0): sm*sm wraps BIGINT silently past
    # ~3e9 total events in non-ANSI Spark (ADVICE r9)
    s2 = (
        "(CAST(n AS DECIMAL(38,0)) * sq - CAST(sm AS DECIMAL(38,0)) * sm)"
    )
    # presentation: the exact integers ship as canonical digit STRINGS,
    # not DECIMAL(38,0) — client layers (pandas/arrow) render DuckDB
    # DECIMAL/HUGEINT as float64 ('2592860.0') while Spark ships exact
    # digits, so a decimal-typed output column hash-mismatches in any
    # type-faithful comparator even when the values are identical (the
    # r10 driver red, root-caused r11). Strings are invariant under
    # every client conversion and lossless at any corpus scale.
    return m.select(
        F.col("n").alias("n_days"),
        F.col("day_idx").cast("bigint").alias("peak_day_idx"),
        F.col("dev").cast("bigint").alias("dev_num"),
        F.expr(f"CAST(CAST({s2} AS DECIMAL(38,0)) AS STRING)").alias("s2_num"),
        F.expr(
            "CAST(CAST(CAST(dev AS DECIMAL(38,0)) * dev * (n - 1) AS DECIMAL(38,0)) AS STRING)"
        ).alias("g_sq_num"),
        F.expr(f"CAST(CAST(CAST(n AS DECIMAL(38,0)) * {s2} AS DECIMAL(38,0)) AS STRING)").alias(
            "g_sq_den"
        ),
    )


# ---------------------------------------------------------------------------
# recency_decay_weights — exact power-of-two freshness weighting.
# ---------------------------------------------------------------------------

_DECAY_HALF_LIFE_DAYS = 30


@register(
    "recency_decay_weights",
    oracle=f"""
WITH d AS (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 AS day_idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
mx AS (SELECT MAX(day_idx) AS mxd FROM d),
w AS (
  SELECT day_idx, n,
         CAST((mx.mxd - day_idx) // {_DECAY_HALF_LIFE_DAYS} AS BIGINT) AS half_lives,
         CAST(1000000 // (CAST(1 AS BIGINT) << LEAST((mx.mxd - day_idx)
              // {_DECAY_HALF_LIFE_DAYS}, 62)) AS BIGINT) AS weight_ppm
  FROM d CROSS JOIN mx
)
SELECT CAST(half_lives AS BIGINT) AS half_lives,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(MAX(weight_ppm) AS BIGINT) AS weight_ppm,
       CAST(SUM(n * weight_ppm) AS BIGINT) AS weighted_events_ppm
FROM w GROUP BY half_lives ORDER BY half_lives
""",
    doc=(
        "Recency-decay sampling weights over the event stream: each "
        "day bucket gets weight 2^-(age/30d half-lives) — the "
        "freshness prior a continually-trained model applies so "
        "last month outweighs last year — computed EXACTLY as "
        "integer ppm via a bit shift (10^6 >> half_lives, truncating; "
        "shift clamped at 62 so the BIGINT never overflows at any "
        "calendar depth): power-of-two decay makes the transcendental "
        "exp() unnecessary and the whole table pure integer. Rolled "
        "up per half-life cohort with exact weighted event mass "
        "(weighted_events_ppm sums n*w without any double). One "
        "distributed day rollup; everything after is "
        "calendar-bounded (SURVEY §2.H)."
    ),
)
def recency_decay_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 1000000 div 86400"
            ).alias("day_idx")
        )
        .groupBy("day_idx")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    mx = d.agg(F.max("day_idx").alias("mxd"))
    w = d.crossJoin(F.broadcast(mx)).select(
        "n",
        F.expr(
            f"(mxd - day_idx) div {_DECAY_HALF_LIFE_DAYS}"
        ).cast("bigint").alias("half_lives"),
        F.expr(
            f"1000000L div (shiftleft(1L, CAST(least((mxd - day_idx)"
            f" div {_DECAY_HALF_LIFE_DAYS}, 62) AS INT)))"
        )
        .cast("bigint")
        .alias("weight_ppm"),
    )
    return (
        w.groupBy("half_lives")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.max("weight_ppm").cast("bigint").alias("weight_ppm"),
            F.sum(F.col("n") * F.col("weight_ppm")).cast("bigint").alias(
                "weighted_events_ppm"
            ),
        )
        .orderBy("half_lives")
    )


# ---------------------------------------------------------------------------
# binary_segmentation — two-level hierarchical change-point scan.
# ---------------------------------------------------------------------------


def _binseg_oracle() -> str:
    # shared score template: for a segment of `ln` days with local
    # prefix sum p (events up to and including local rank r) and
    # segment total `tot`, the centered-CUSUM score at the candidate
    # split after local rank r is |ln*p - r*tot| — all BIGINT
    # (days*events <= 3650*1e12 at 100 TB, far under the 9.2e18 bound)
    return """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
r AS (
  SELECT d, n,
         ROW_NUMBER() OVER (ORDER BY d) AS t,
         SUM(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS s
  FROM daily
),
tot AS (SELECT COUNT(*) AS nd, SUM(n) AS sm FROM daily),
root AS (
  SELECT d, t, s, ABS(tot.nd * s - t * tot.sm) AS score
  FROM r CROSS JOIN tot
  WHERE t < tot.nd
  ORDER BY score DESC, d ASC LIMIT 1
),
seg AS (
  SELECT r.d, r.n,
         CASE WHEN r.t <= root.t THEN 1 ELSE 2 END AS seg_id,
         CASE WHEN r.t <= root.t THEN r.t ELSE r.t - root.t END AS lt,
         CASE WHEN r.t <= root.t THEN r.s ELSE r.s - root.s END AS ls,
         CASE WHEN r.t <= root.t THEN root.t ELSE tot.nd - root.t END AS ln,
         CASE WHEN r.t <= root.t THEN root.s ELSE tot.sm - root.s END AS lsum
  FROM r CROSS JOIN root CROSS JOIN tot
),
child AS (
  SELECT seg_id, d, ABS(ln * ls - lt * lsum) AS score, ln, lsum,
         ROW_NUMBER() OVER (
           PARTITION BY seg_id ORDER BY ABS(ln * ls - lt * lsum) DESC, d ASC
         ) AS rk
  FROM seg WHERE lt < ln
)
SELECT CAST(0 AS BIGINT) AS seg_id, root.d AS split_day,
       CAST(root.score AS BIGINT) AS score_num,
       CAST(tot.nd AS BIGINT) AS n_days, CAST(tot.sm AS BIGINT) AS n_events
FROM root CROSS JOIN tot
UNION ALL
SELECT CAST(seg_id AS BIGINT), d, CAST(score AS BIGINT),
       CAST(ln AS BIGINT), CAST(lsum AS BIGINT)
FROM child WHERE rk = 1
ORDER BY seg_id
"""


@register(
    "binary_segmentation",
    oracle=_binseg_oracle(),
    doc=(
        "Two-level binary segmentation of the daily event-count "
        "series: the root change-point is the day maximizing the "
        "centered-CUSUM score |T*S_t - t*S| (the same integer "
        "statistic cusum_changepoint scans once), then each resulting "
        "half is scanned AGAIN with segment-local totals — the "
        "recursive refinement that turns one 'did the mix shift?' "
        "answer into a 3-node changepoint tree (root + best split of "
        "each half; a half shorter than 2 days contributes no row, "
        "same rule both engines). Pure BIGINT throughout: "
        "days*events stays under 4e15 even at the 100 TB target, "
        "earliest-day tiebreak on equal scores. Scale shape: ONE "
        "map-side-combined daily aggregate is the only event-stream "
        "pass; both scans are O(days) windows over the calendar-"
        "bounded table, and the 1-row root argmax broadcasts "
        "(SURVEY §2.H)."
    ),
)
def binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.col("ts").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # LINEAR single-scan plan: every corpus-level constant (totals,
    # root argmax) rides an unpartitioned window over the days-sized
    # frame instead of a crossJoin branch — branching would re-expand
    # the subtree into one events scan PER USE (observed: 6 scans),
    # which is exactly what must not happen at 100 TB. All windows
    # here are O(days).
    w_ord = Window.orderBy("d")
    w_all = Window.partitionBy()
    r = daily.select(
        "d",
        "n",
        F.row_number().over(w_ord).alias("t"),
        F.sum("n").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
    )
    r = r.select(
        "*",
        F.max("t").over(w_all).alias("nd"),
        F.max("s").over(w_all).alias("sm"),  # s is monotone: max == total
    ).withColumn("score", F.abs(F.col("nd") * F.col("s") - F.col("t") * F.col("sm")))
    r = r.withColumn(
        "mx", F.max(F.when(F.col("t") < F.col("nd"), F.col("score"))).over(w_all)
    )
    r = r.withColumn(
        "root_t",
        F.min(
            F.when((F.col("score") == F.col("mx")) & (F.col("t") < F.col("nd")), F.col("t"))
        ).over(w_all),
    )
    r = r.withColumn(
        "root_s", F.min(F.when(F.col("t") == F.col("root_t"), F.col("s"))).over(w_all)
    )
    left = F.col("t") <= F.col("root_t")
    seg = r.select(
        "*",
        F.when(left, 1).otherwise(2).alias("seg_id"),
        F.when(left, F.col("t")).otherwise(F.col("t") - F.col("root_t")).alias("lt"),
        F.when(left, F.col("s")).otherwise(F.col("s") - F.col("root_s")).alias("ls"),
        F.when(left, F.col("root_t")).otherwise(F.col("nd") - F.col("root_t")).alias("ln"),
        F.when(left, F.col("root_s")).otherwise(F.col("sm") - F.col("root_s")).alias("lsum"),
    ).withColumn(
        "cscore", F.abs(F.col("ln") * F.col("ls") - F.col("lt") * F.col("lsum"))
    )
    w_seg = Window.partitionBy("seg_id")
    interior = F.col("lt") < F.col("ln")
    seg = seg.withColumn(
        "mxc", F.max(F.when(interior, F.col("cscore"))).over(w_seg)
    ).withColumn(
        "pick_t",
        F.min(F.when(interior & (F.col("cscore") == F.col("mxc")), F.col("t"))).over(
            w_seg
        ),
    )
    is_root = F.col("t") == F.col("root_t")
    return (
        seg.where(is_root | (F.col("t") == F.col("pick_t")))
        .select(
            F.when(is_root, 0).otherwise(F.col("seg_id")).cast("bigint").alias(
                "seg_id"
            ),
            F.col("d").alias("split_day"),
            F.when(is_root, F.col("mx"))
            .otherwise(F.col("mxc"))
            .cast("bigint")
            .alias("score_num"),
            F.when(is_root, F.col("nd"))
            .otherwise(F.col("ln"))
            .cast("bigint")
            .alias("n_days"),
            F.when(is_root, F.col("sm"))
            .otherwise(F.col("lsum"))
            .cast("bigint")
            .alias("n_events"),
        )
        .orderBy("seg_id")
    )

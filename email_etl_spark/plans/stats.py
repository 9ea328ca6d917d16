"""Statistical modeling operators (SURVEY.md §2.L extensions):
grouped OLS regression, an embedding-similarity histogram (the
representation-collapse diagnostic), and a seasonal-strength
decomposition of the daily volume series. These extend the engine's
descriptive statistics (corr_matrix, winsorized_stats, acf_daily)
with the model-fitting layer an analytics warehouse serves.

Determinism conventions (plans/registry.py): regression moments are
pure-integer sums (prices in centi-units) combined in DECIMAL(38,0);
the final slope/intercept/r2 are single identical double expressions
in both engines. Histogram bins come from the ROUNDED cosine, so bin
edges can never straddle a float artifact. Seasonal means are rounded
to DECIMAL(18,6) before any residual is formed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.functions.vectors import cosine_rounded, duckdb_cosine
from email_etl_spark.io import load_table, parallelize_scan
from email_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# ols_price_size — per-brand least-squares fit of retail price vs size.
# ---------------------------------------------------------------------------


@register(
    "ols_price_size",
    oracle="""
WITH m AS (
  SELECT p_brand,
         COUNT(*) AS n,
         SUM(p_size) AS sx,
         SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS sy,
         SUM(p_size * CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS sxy,
         SUM(p_size * p_size) AS sxx,
         SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)
             * CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS syy
  FROM part GROUP BY p_brand
),
d AS (
  SELECT p_brand, n,
         CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS num,
         CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den,
         CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS dy,
         sx, sy
  FROM m
)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS slope_centi,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 4) AS intercept_centi,
       CASE WHEN dy = 0 THEN 0.0
            ELSE ROUND((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                       * (CAST(num AS DOUBLE) / CAST(dy AS DOUBLE)), 6)
       END AS r2
FROM d ORDER BY p_brand
""",
    doc=(
        "Per-brand OLS fit of retail price against part size (does "
        "this brand price by size, and how tightly?): the five "
        "regression moments are ONE map-side-combined integer "
        "aggregate (prices in exact centi-units, so distributed sums "
        "are order-insensitive), combined into slope/intercept/r2 in "
        "DECIMAL(38,0) cross-products — no covariance matrix, no ML "
        "library, no second pass. The r2 identity num^2/(den*dy) is "
        "computed as (num/den)*(num/dy) in identical double "
        "expression trees both engines, avoiding the 10^52 integer "
        "blowup at cluster scale (SURVEY §2.L)."
    ),
)
def ols_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    y = F.round(F.col("p_retailprice") * 100).cast("bigint")
    m = part.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("p_size").alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(F.col("p_size") * y).alias("sxy"),
        F.sum(F.col("p_size") * F.col("p_size")).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    d = m.select(
        "p_brand",
        "n",
        "sx",
        "sy",
        (dec("n") * F.col("sxy") - dec("sx") * F.col("sy")).alias("num"),
        (dec("n") * F.col("sxx") - dec("sx") * F.col("sx")).alias("den"),
        (dec("n") * F.col("syy") - dec("sy") * F.col("sy")).alias("dy"),
    )
    slope = F.col("num").cast("double") / F.col("den").cast("double")
    return d.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope_centi"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            4,
        ).alias("intercept_centi"),
        F.when(F.col("dy") == 0, F.lit(0.0))
        .otherwise(
            F.round(slope * (F.col("num").cast("double") / F.col("dy").cast("double")), 6)
        )
        .alias("r2"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# embedding_sim_hist — pairwise-cosine histogram over a hash sample.
# ---------------------------------------------------------------------------

SIMHIST_HI = "1a"  # md5 2-hex-digit prefix < '1a' => 26/256 ~ 10% sample
SIMHIST_BINS = 20  # bin width 0.1 over [-1, 1): bin = floor(sim * 10)


@register(
    "embedding_sim_hist",
    oracle=f"""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE substr(md5('simhist:' || CAST(vec_id AS VARCHAR)), 1, 2) < '{SIMHIST_HI}'
),
p AS (
  SELECT {duckdb_cosine("a.embedding", "b.embedding")} AS sim
  FROM s a JOIN s b ON a.vec_id < b.vec_id
),
b AS (SELECT CAST(FLOOR(sim * 10) AS BIGINT) AS bin, CAST(sim AS DECIMAL(6,4)) AS simd FROM p)
SELECT ROUND(bin / 10.0, 1) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(simd) AS DOUBLE) / COUNT(*), 4) AS avg_sim
FROM b GROUP BY bin ORDER BY bin_lo
""",
    doc=(
        "Pairwise-cosine histogram over a deterministic ~10% md5 "
        "sample of the embedding cloud — the representation-collapse "
        "diagnostic (a healthy space piles mass near 0; mass near 1 "
        "means the embedder collapsed; bimodal means cluster "
        "structure). Bins come from the ROUNDED cosine so no edge "
        "straddles a float artifact; per-bin means fold DECIMAL(6,4) "
        "exactly. The sampled side is broadcast into an id-ordered "
        "pair join, so the full corpus is touched once by the sample "
        "filter (pushed to the scan) and never joined against "
        "itself; the sample fraction is the scale knob — production "
        "fixes the pair budget by tightening the md5 prefix "
        "(SURVEY §2.F)."
    ),
)
def embedding_sim_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = parallelize_scan(load_table(spark, sf_dir, "embeddings"))
    s = emb.where(
        F.substring(
            F.md5(F.concat(F.lit("simhist:"), F.col("vec_id").cast("string"))), 1, 2
        )
        < SIMHIST_HI
    )
    a = s.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = s.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    p = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        cosine_rounded(F.col("ea"), F.col("eb")).alias("sim")
    )
    binned = p.select(
        F.floor(F.col("sim") * 10).cast("bigint").alias("bin"),
        F.col("sim").cast("decimal(6,4)").alias("simd"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("simd").alias("ssim"),
        )
        .select(
            F.round(F.col("bin") / 10.0, 1).alias("bin_lo"),
            "n_pairs",
            F.round(F.col("ssim").cast("double") / F.col("n_pairs"), 4).alias("avg_sim"),
        )
        .orderBy("bin_lo")
    )


# ---------------------------------------------------------------------------
# seasonal_strength — weekday-seasonality R^2 of the daily series.
# ---------------------------------------------------------------------------


@register(
    "seasonal_strength",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
dd AS (SELECT d, n, dayofweek(d) AS dow FROM daily),
wm AS (
  SELECT dow, CAST(ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS mw
  FROM dd GROUP BY dow
),
gm AS (
  SELECT CAST(ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS mg,
         COUNT(*) AS nd
  FROM dd
),
r AS (
  SELECT SUM(CAST((dd.n - wm.mw) * (dd.n - wm.mw) AS DECIMAL(38,12))) AS sse,
         SUM(CAST((dd.n - gm.mg) * (dd.n - gm.mg) AS DECIMAL(38,12))) AS sst,
         MAX(gm.nd) AS n_days
  FROM dd JOIN wm USING (dow) CROSS JOIN gm
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       ROUND(CAST(sst AS DOUBLE), 4) AS sst,
       ROUND(CAST(sse AS DOUBLE), 4) AS sse,
       CASE WHEN sst = 0 THEN 0.0
            ELSE ROUND(1.0 - CAST(sse AS DOUBLE) / CAST(sst AS DOUBLE), 6)
       END AS strength
FROM r
""",
    doc=(
        "Weekday-seasonality strength of the daily event series: the "
        "R^2 of the per-weekday-mean model vs the grand mean (STL's "
        "'seasonal strength' with a weekly period) — quantifies what "
        "acf_daily's lag-7 peak only hints at. Weekday and grand "
        "means are rounded to DECIMAL(18,6) BEFORE any residual is "
        "formed, and squared residuals fold in DECIMAL(38,12), so "
        "the distributed sums are exact; the 7-row weekday-mean "
        "table broadcasts into the O(days) residual pass "
        "(SURVEY §2.H)."
    ),
)
def seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    dd = daily.select("d", "n", F.dayofweek("d").alias("dow"))
    mean6 = lambda: F.round(  # noqa: E731
        F.sum("n").cast("double") / F.count("*"), 6
    ).cast("decimal(18,6)")
    wm = dd.groupBy("dow").agg(mean6().alias("mw"))
    gm = dd.agg(mean6().alias("mg"), F.count("*").alias("nd"))
    r = (
        dd.join(F.broadcast(wm), "dow")
        .crossJoin(F.broadcast(gm))
        .agg(
            F.sum(
                ((F.col("n") - F.col("mw")) * (F.col("n") - F.col("mw"))).cast(
                    "decimal(38,12)"
                )
            ).alias("sse"),
            F.sum(
                ((F.col("n") - F.col("mg")) * (F.col("n") - F.col("mg"))).cast(
                    "decimal(38,12)"
                )
            ).alias("sst"),
            F.max("nd").alias("n_days"),
        )
    )
    return r.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.col("sst").cast("double"), 4).alias("sst"),
        F.round(F.col("sse").cast("double"), 4).alias("sse"),
        F.when(F.col("sst") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0) - F.col("sse").cast("double") / F.col("sst").cast("double"), 6
            )
        )
        .alias("strength"),
    )


# ---------------------------------------------------------------------------
# robust_zscore_mad — median/MAD outlier scoring (the robust twin of
# anomaly_zscore's mean/std).
# ---------------------------------------------------------------------------

# 0.6745 = Phi^-1(3/4): scales MAD to sigma-equivalent units. The
# outlier test 0.6745*|x-med|/MAD > 3.5 runs as the cross-multiplied
# integer inequality 2*6745*|2x-med2| > 35000*mad4 (see below), so no
# engine ever compares rounded doubles.
MAD_K_NUM = 6745  # 1e4 * 0.6745
MAD_Z_CUT = 35_000  # 1e4 * 3.5


@register(
    "robust_zscore_mad",
    oracle=f"""
WITH x AS (
  SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS xm FROM events
),
m AS (
  SELECT event_type,
         CAST(ROUND(2 * quantile_cont(xm, 0.5)) AS BIGINT) AS med2
  FROM x GROUP BY 1
),
a AS (
  SELECT x.event_type,
         CAST(ROUND(2 * quantile_cont(ABS(2 * x.xm - m.med2), 0.5)) AS BIGINT) AS mad4
  FROM x JOIN m USING (event_type) GROUP BY 1
)
SELECT m.event_type,
       COUNT(*) AS n,
       ROUND(CAST(m.med2 AS DOUBLE) / 2000000, 6) AS med,
       ROUND(CAST(a.mad4 AS DOUBLE) / 4000000, 6) AS mad,
       CAST(SUM(CASE WHEN 2 * {MAD_K_NUM} * ABS(2 * x.xm - m.med2)
                          > {MAD_Z_CUT} * a.mad4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM x JOIN m USING (event_type) JOIN a USING (event_type)
GROUP BY 1, 3, 4 ORDER BY 1
""",
    doc=(
        "Median/MAD robust outlier scoring per event type — the "
        "heavy-tail-safe twin of anomaly_zscore (one extreme value "
        "shifts a mean/std gate; the median/MAD gate moves only with "
        "the bulk). Flags values with 0.6745*|x-med|/MAD > 3.5 "
        "(Iglewicz-Hoaglin modified z). Determinism: values go to "
        "exact micro-unit integers; med2=2*median and mad4=4*MAD stay "
        "integers (an even-n median interpolates to .5, doubled is "
        "exact), and the outlier test is a cross-multiplied integer "
        "inequality — no rounded-double comparisons anywhere. Shape: "
        "two grouped exact percentiles + one counting pass, all "
        "map-side combinable except the per-group percentile sort, "
        "which shuffles once on the (bounded-cardinality) type key; "
        "at 100 TB swap percentile for approx_percentile and keep the "
        "integer test (SURVEY §2.L)."
    ),
)
def robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type", F.round(F.col("value") * 1000000).cast("bigint").alias("xm")
    )
    m = x.groupBy("event_type").agg(
        F.round(2 * F.percentile("xm", 0.5)).cast("bigint").alias("med2")
    )
    xm2 = x.join(F.broadcast(m), "event_type").select(
        "event_type", "xm", "med2", F.abs(2 * F.col("xm") - F.col("med2")).alias("dev2")
    )
    a = xm2.groupBy("event_type").agg(
        F.round(2 * F.percentile("dev2", 0.5)).cast("bigint").alias("mad4")
    )
    return (
        xm2.join(F.broadcast(a), "event_type")
        .groupBy(
            "event_type",
            F.round(F.col("med2").cast("double") / 2000000, 6).alias("med"),
            F.round(F.col("mad4").cast("double") / 4000000, 6).alias("mad"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    2 * MAD_K_NUM * F.col("dev2") > MAD_Z_CUT * F.col("mad4"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select("event_type", "n", "med", "mad", "n_outliers")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# priority_status_chi2 — chi-squared independence test on orders.
# ---------------------------------------------------------------------------


@register(
    "priority_status_chi2",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS pr, o_orderstatus AS st, COUNT(*) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT pr, SUM(o) AS r FROM cells GROUP BY pr),
ct AS (SELECT st, SUM(o) AS c FROM cells GROUP BY st),
tot AS (SELECT SUM(o) AS n FROM cells),
terms AS (
  SELECT CAST(ROUND(
           POWER(CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n, 2)
             / (CAST(r AS DOUBLE) * c / n), 8) AS DECIMAL(18,8)) AS term
  FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN tot
)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1)
            AS BIGINT) AS dof,
       CAST(SUM(term) AS DOUBLE) AS chi2
FROM terms
""",
    doc=(
        "Chi-squared independence test of order priority x order "
        "status — the categorical-association diagnostic behind 'is "
        "fulfillment behaving differently for urgent orders?' "
        "(sample_bias_chi2 tests a SAMPLE against its population; "
        "this tests two ATTRIBUTES against each other). One map-side-"
        "combined pass builds the contingency cells; margins are "
        "cell-table rollups (priorities x statuses ~ 15 rows at any "
        "corpus size), each cell's (O-E)^2/E term is rounded to "
        "DECIMAL(18,8) before the order-insensitive sum, so the "
        "distributed aggregate is bit-equal to the oracle "
        "(SURVEY §2.L)."
    ),
)
def priority_status_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("pr"), F.col("o_orderstatus").alias("st")
    ).agg(F.count("*").alias("o"))
    rt = cells.groupBy("pr").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("st").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = F.round(
        F.pow(F.col("o").cast("double") - e, 2) / e, 8
    ).cast("decimal(18,8)")
    joined = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(tot))
    )
    n_r = rt.agg(F.count("*").alias("nr"))
    n_c = ct.agg(F.count("*").alias("nc"))
    return (
        joined.agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(term.alias("t")).cast("double").alias("chi2"),
        )
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
        .select(
            "n_orders",
            "n_cells",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
            "chi2",
        )
    )


# ---------------------------------------------------------------------------
# mannwhitney_value — rank-sum distribution comparison (purchase vs view).
# ---------------------------------------------------------------------------

_MW_A, _MW_B = "purchase", "view"


def _mannwhitney_oracle() -> str:
    return f"""
WITH base AS (
  SELECT value AS v, event_type = '{_MW_A}' AS is_a
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
g AS (
  SELECT v,
         CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ta
  FROM base GROUP BY v
),
w AS (
  SELECT v, t, ta,
         COALESCE(SUM(t) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
  FROM g
),
s AS (
  SELECT CAST(SUM(ta) AS BIGINT) AS n1,
         CAST(SUM(t - ta) AS BIGINT) AS n2,
         CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(ta * (2 * cum_before + t + 1)) AS BIGINT) AS r2a,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM w
)
SELECT n1 AS n_{_MW_A},
       n2 AS n_{_MW_B},
       r2a - n1 * (n1 + 1) AS u_stat_x2,
       ROUND((r2a - n1 * (n1 + 1) - n1 * n2)
             / (2.0 * SQRT((CAST(n1 AS DOUBLE) * n2 / 12.0)
                           * ((n + 1.0) - CAST(ties AS DOUBLE)
                              / (CAST(n AS DOUBLE) * (n - 1.0))))), 4) AS z,
       ABS(ROUND((r2a - n1 * (n1 + 1) - n1 * n2)
             / (2.0 * SQRT((CAST(n1 AS DOUBLE) * n2 / 12.0)
                           * ((n + 1.0) - CAST(ties AS DOUBLE)
                              / (CAST(n AS DOUBLE) * (n - 1.0))))), 4)) > 1.96
         AS reject_95
FROM s
"""


@register(
    "mannwhitney_value",
    oracle=_mannwhitney_oracle(),
    doc=(
        "Mann-Whitney U rank-sum test: do purchase and view events draw "
        "their `value` from the same distribution? The distribution-free "
        "companion to weekday_anova's means test — robust to the heavy "
        "right tail that makes t-tests lie about revenue-like columns. "
        "Tied values get average ranks kept INTEGER by working with "
        "2x rank sums (2*avg_rank = 2*cum_before + t + 1), the U "
        "statistic is reported as 2U (exact bigint), and the normal "
        "approximation includes the exact tie correction sum(t^3 - t); "
        "every aggregate is an integer until the single final z "
        "expression, shared verbatim by both engines. One groupBy on "
        "distinct values + one O(distinct) window pass "
        "(SURVEY §2.L)."
    ),
)
def mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_MW_A, _MW_B)
    )
    g = ev.groupBy(F.col("value").alias("v")).agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum(F.when(F.col("event_type") == _MW_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ta"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "t", "ta", F.coalesce(F.sum("t").over(w), F.lit(0)).alias("cum_before")
    )
    s = ranked.agg(
        F.sum("ta").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("ta")).cast("bigint").alias("n2"),
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("ta") * (2 * F.col("cum_before") + F.col("t") + 1))
        .cast("bigint")
        .alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("ties"),
    )
    z = F.round(
        (F.col("r2a") - F.col("n1") * (F.col("n1") + 1) - F.col("n1") * F.col("n2"))
        / (
            2.0
            * F.sqrt(
                (F.col("n1").cast("double") * F.col("n2") / 12.0)
                * (
                    (F.col("n") + 1.0)
                    - F.col("ties").cast("double")
                    / (F.col("n").cast("double") * (F.col("n") - 1.0))
                )
            )
        ),
        4,
    )
    return s.select(
        F.col("n1").alias(f"n_{_MW_A}"),
        F.col("n2").alias(f"n_{_MW_B}"),
        (F.col("r2a") - F.col("n1") * (F.col("n1") + 1)).alias("u_stat_x2"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# kruskal_wallis_value — k-group rank test (all event types at once).
# ---------------------------------------------------------------------------

# chi-square 0.05 critical value for dof = 4 (the 5-type events schema;
# the doc string pins the schema dependency)
_KW_CRIT_DOF4 = 9.4877


def _kruskal_oracle() -> str:
    return f"""
WITH base AS (SELECT value AS v, event_type AS g FROM events),
gv AS (
  SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY v, g
),
tv AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM gv GROUP BY v
),
w AS (
  SELECT v, t,
         COALESCE(SUM(t) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
  FROM tv
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS ties
  FROM w
),
r AS (
  SELECT gv.g,
         CAST(SUM(gv.c) AS BIGINT) AS ng,
         CAST(SUM(gv.c * (2 * w.cum_before + w.t + 1)) AS BIGINT) AS r2g
  FROM gv JOIN w ON gv.v = w.v
  GROUP BY gv.g
),
terms AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(ROUND(CAST(r2g AS DOUBLE) * r2g
                        / (4.0 * ng * (SELECT n FROM tot)
                           * ((SELECT n FROM tot) + 1)), 6)
                  AS DECIMAL(18,6))) AS tsum
  FROM r
)
SELECT (SELECT n FROM tot) AS n_events,
       k AS k_groups,
       k - 1 AS dof,
       ROUND((12.0 * CAST(tsum AS DOUBLE) - 3.0 * ((SELECT n FROM tot) + 1))
             / (1.0 - CAST((SELECT ties FROM tot) AS DOUBLE)
                      / (CAST((SELECT n FROM tot) AS DOUBLE)
                         * (SELECT n FROM tot) * (SELECT n FROM tot)
                         - (SELECT n FROM tot))), 4) AS h_stat,
       (12.0 * CAST(tsum AS DOUBLE) - 3.0 * ((SELECT n FROM tot) + 1))
         / (1.0 - CAST((SELECT ties FROM tot) AS DOUBLE)
                  / (CAST((SELECT n FROM tot) AS DOUBLE)
                     * (SELECT n FROM tot) * (SELECT n FROM tot)
                     - (SELECT n FROM tot))) > {_KW_CRIT_DOF4}
         AS reject_95
FROM terms
"""


@register(
    "kruskal_wallis_value",
    oracle=_kruskal_oracle(),
    doc=(
        "Kruskal-Wallis H test: do the k event types draw `value` from "
        "one distribution? The k-group generalization of "
        "mannwhitney_value (same tie-corrected average-rank machinery, "
        "kept integer via 2x rank sums), and the rank-based complement "
        "to weekday_anova's F on means. Per-group rank sums come off a "
        "(value, type)-rollup joined to the distinct-value cumulative "
        "table, so the only ordered pass is O(distinct values); the "
        "k normalized between terms (2R_g)^2/(4 n_g N (N+1)) are "
        "pre-rounded to DECIMAL(18,6) so their sum is order-insensitive "
        "(weekday_anova convention — magnitude ~N/4, decimal-safe past "
        "sf100). reject_95 compares against the dof=4 chi-square "
        "critical value 9.4877 — pinned to the 5-type events schema "
        "(SURVEY §2.L)."
    ),
)
def kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").alias("v"), F.col("event_type").alias("g")
    )
    gv = ev.groupBy("v", "g").agg(F.count("*").cast("bigint").alias("c"))
    tv = gv.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    w = tv.select(
        "v",
        "t",
        F.coalesce(
            F.sum("t").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_before"),
    )
    tot = F.broadcast(
        w.agg(
            F.sum("t").cast("bigint").alias("n"),
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("ties"),
        )
    )
    r = (
        gv.join(w.select("v", "t", "cum_before"), "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("bigint").alias("ng"),
            F.sum(F.col("c") * (2 * F.col("cum_before") + F.col("t") + 1))
            .cast("bigint")
            .alias("r2g"),
        )
    )
    terms = (
        r.crossJoin(tot)
        .select(
            "n",
            "ties",
            F.expr(
                "CAST(ROUND(CAST(r2g AS DOUBLE) * r2g"
                " / (4.0 * ng * n * (n + 1)), 6) AS DECIMAL(18,6))"
            ).alias("term"),
        )
        .groupBy("n", "ties")
        .agg(F.count("*").cast("bigint").alias("k"), F.sum("term").alias("tsum"))
    )
    h = F.expr(
        "(12.0 * CAST(tsum AS DOUBLE) - 3.0 * (n + 1))"
        " / (1.0 - CAST(ties AS DOUBLE)"
        "          / (CAST(n AS DOUBLE) * n * n - n))"
    )
    return terms.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.round(h, 4).alias("h_stat"),
        (h > _KW_CRIT_DOF4).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# levene_value — Brown–Forsythe variance-homogeneity test across types.
# ---------------------------------------------------------------------------


def _levene_oracle() -> str:
    return """
WITH med AS (
  SELECT event_type AS g, median(value) AS md FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_type AS g,
         CAST(ROUND(ABS(e.value - m.md) * 1000) AS BIGINT) AS zm
  FROM events e JOIN med m ON e.event_type = m.g
),
gs AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(zm) AS BIGINT) AS s,
         SUM(CAST(zm AS DECIMAL(38,0)) * zm) AS q,
         CAST(ROUND(CAST(SUM(zm) AS DOUBLE) * SUM(zm)
                    / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6)
              AS DECIMAL(26,6)) AS term
  FROM z GROUP BY g
),
s AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s) AS BIGINT) AS s_all,
         CAST(SUM(q) AS DOUBLE) / 1000000.0 AS q_all,
         CAST(SUM(term) AS DOUBLE) AS t
  FROM gs
)
SELECT n AS n_events, k AS k_groups,
       k - 1 AS df1, n - k AS df2,
       ROUND(((t - CAST(s_all AS DOUBLE) * s_all / (CAST(n AS DOUBLE) * 1000000.0))
              / (k - 1))
             / ((q_all - t) / (n - k)), 4) AS w_stat
FROM s
"""


@register(
    "levene_value",
    oracle=_levene_oracle(),
    doc=(
        "Brown–Forsythe test (Levene with group MEDIANS — the "
        "robust-to-skew variant): do the k event types have equal "
        "`value` spread? Equal-means tests (weekday_anova) assume it; "
        "this is the diagnostic that says whether that assumption "
        "holds. Per-group medians land in a k-row broadcast dim; the "
        "absolute deviations are kept exact as BIGINT milli-units, so "
        "every sufficient statistic (S_g, Q_g as DECIMAL(38,0)) is "
        "order-insensitive; the k between terms S_g^2/(n_g 1e6) are "
        "pre-rounded to DECIMAL(26,6) (sf100-safe magnitude) and the "
        "final W is one shared double expression. One events scan + "
        "one k-row broadcast join + one groupBy (SURVEY §2.L)."
    ),
)
def levene_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.expr("median(value)").alias("md")
    )
    z = ev.join(
        F.broadcast(med), ev["event_type"] == med["g"], "inner"
    ).select(
        "g",
        F.round(F.abs(F.col("value") - F.col("md")) * 1000)
        .cast("bigint")
        .alias("zm"),
    )
    gs = z.groupBy("g").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("zm").cast("bigint").alias("s"),
        F.sum(F.col("zm").cast("decimal(38,0)") * F.col("zm")).alias("q"),
        F.expr(
            "CAST(ROUND(CAST(SUM(zm) AS DOUBLE) * SUM(zm)"
            " / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6) AS DECIMAL(26,6))"
        ).alias("term"),
    )
    s = gs.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("s").cast("bigint").alias("s_all"),
        (F.sum("q").cast("double") / 1000000.0).alias("q_all"),
        F.sum("term").cast("double").alias("t"),
    )
    return s.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("k_groups"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df2"),
        F.round(
            F.expr(
                "((t - CAST(s_all AS DOUBLE) * s_all"
                "  / (CAST(n AS DOUBLE) * 1000000.0)) / (k - 1))"
                " / ((q_all - t) / (n - k))"
            ),
            4,
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# spearman_value_hour — rank correlation between value and hour of day.
# ---------------------------------------------------------------------------


def _spearman_oracle() -> str:
    return """
WITH base AS (
  SELECT value AS x, EXTRACT(hour FROM ts) AS y FROM events
),
rx AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY x
),
wx AS (
  SELECT x, 2 * COALESCE(SUM(t) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + t + 1 AS r2x
  FROM rx
),
ry AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY y
),
wy AS (
  SELECT y, 2 * COALESCE(SUM(t) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + t + 1 AS r2y
  FROM ry
),
j AS (
  SELECT wx.r2x, wy.r2y
  FROM base JOIN wx ON base.x = wx.x JOIN wy ON base.y = wy.y
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(r2x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(r2y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(r2x AS DECIMAL(38,0)) * r2x) AS sxx,
         SUM(CAST(r2y AS DECIMAL(38,0)) * r2y) AS syy,
         SUM(CAST(r2x AS DECIMAL(38,0)) * r2y) AS sxy
  FROM j
)
SELECT n AS n_events,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS rho
FROM s
"""


@register(
    "spearman_value_hour",
    oracle=_spearman_oracle(),
    doc=(
        "Spearman rank correlation between event `value` and hour of "
        "day: do high-value events concentrate at particular times? "
        "Monotone-robust where corr_matrix's Pearson is linear-only, "
        "and the effect-SIZE companion to ks_uniform_hour's existence "
        "test. Tied ranks stay exact integers via the doubled-average-"
        "rank trick (2r = 2*cum_before + t + 1, mannwhitney "
        "convention) on BOTH variables; the five cross-moments "
        "accumulate in DECIMAL(38,0) (order-insensitive, overflow-"
        "safe past sf100) and rho is one shared double expression — "
        "Pearson on ranks, the textbook tie-corrected Spearman. "
        "Ordered passes are O(distinct values) and O(24) only "
        "(SURVEY §2.L)."
    ),
)
def spearman_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.col("value").alias("x"), F.hour("ts").alias("y")
    )
    rx = ev.groupBy("x").agg(F.count("*").cast("bigint").alias("t"))
    wpre = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    wx = rx.select(
        "x",
        (2 * F.coalesce(F.sum("t").over(wpre), F.lit(0)) + F.col("t") + 1).alias(
            "r2x"
        ),
    )
    ry = ev.groupBy("y").agg(F.count("*").cast("bigint").alias("t"))
    wprey = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    wy = ry.select(
        "y",
        (2 * F.coalesce(F.sum("t").over(wprey), F.lit(0)) + F.col("t") + 1).alias(
            "r2y"
        ),
    )
    j = ev.join(wx, "x").join(F.broadcast(wy), "y").select("r2x", "r2y")
    s = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("r2x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("r2y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("r2x").cast("decimal(38,0)") * F.col("r2x")).alias("sxx"),
        F.sum(F.col("r2y").cast("decimal(38,0)") * F.col("r2y")).alias("syy"),
        F.sum(F.col("r2x").cast("decimal(38,0)") * F.col("r2y")).alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_events"),
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
            ),
            4,
        ).alias("rho"),
    )


# ---------------------------------------------------------------------------
# cohens_d_value — standardized effect size, purchase vs view value.
# ---------------------------------------------------------------------------


@register(
    "cohens_d_value",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
s AS (
  SELECT CAST(SUM(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN event_type = '{_MW_A}' THEN vc ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN event_type = '{_MW_B}' THEN vc ELSE 0 END) AS BIGINT) AS s2,
         SUM(CASE WHEN event_type = '{_MW_A}'
                  THEN CAST(vc AS DECIMAL(38,0)) * vc ELSE 0 END) AS q1,
         SUM(CASE WHEN event_type = '{_MW_B}'
                  THEN CAST(vc AS DECIMAL(38,0)) * vc ELSE 0 END) AS q2
  FROM b
)
SELECT n1 AS n_{_MW_A}, n2 AS n_{_MW_B},
       CAST(s1 * 10 // n1 - s2 * 10 // n2 AS BIGINT) AS mean_diff_milli,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                    / (n1 + n2 - 2)), 4) AS cohens_d,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
                    / (n1 + n2 - 2))
             * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 4) AS hedges_g
FROM s
""",
    doc=(
        "Cohen's d (+ Hedges' g small-sample correction) for the "
        "purchase-vs-view `value` gap: the standardized effect SIZE "
        "companion to mannwhitney_value's significance — at 100 TB "
        "row counts everything is 'significant', so the magnitude "
        "number is the one that matters for decisions. The 2-decimal "
        "value column is exact in centi-units, so n/S/Q sufficient "
        "statistics are pure integers (Q in DECIMAL(38,0)) off ONE "
        "conditional-aggregate scan — no per-group pass, no join; "
        "d and g are single shared double expressions, the mean gap "
        "also reported in exact integer milli-units (SURVEY §2.L)."
    ),
)
def cohens_d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_MW_A, _MW_B)
    )
    b = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("vc")
    )
    is1 = F.col("event_type") == _MW_A
    is2 = F.col("event_type") == _MW_B
    s = b.agg(
        F.sum(is1.cast("bigint")).cast("bigint").alias("n1"),
        F.sum(is2.cast("bigint")).cast("bigint").alias("n2"),
        F.sum(F.when(is1, F.col("vc")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is2, F.col("vc")).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(
            F.when(is1, F.col("vc").cast("decimal(38,0)") * F.col("vc")).otherwise(0)
        ).alias("q1"),
        F.sum(
            F.when(is2, F.col("vc").cast("decimal(38,0)") * F.col("vc")).otherwise(0)
        ).alias("q2"),
    )
    d = F.expr(
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
        " / SQRT(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)"
        "         + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))"
        "        / (n1 + n2 - 2))"
    )
    return s.select(
        F.col("n1").alias(f"n_{_MW_A}"),
        F.col("n2").alias(f"n_{_MW_B}"),
        F.expr("s1 * 10 div n1 - s2 * 10 div n2")
        .cast("bigint")
        .alias("mean_diff_milli"),
        F.round(d, 4).alias("cohens_d"),
        F.round(d * F.expr("1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)"), 4).alias(
            "hedges_g"
        ),
    )


# ---------------------------------------------------------------------------
# welch_t_value — unequal-variance t-test, purchase vs view value.
# ---------------------------------------------------------------------------


@register(
    "welch_t_value",
    oracle=f"""
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
s AS (
  SELECT CAST(SUM(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN event_type = '{_MW_A}' THEN vc ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN event_type = '{_MW_B}' THEN vc ELSE 0 END) AS BIGINT) AS s2,
         SUM(CASE WHEN event_type = '{_MW_A}'
                  THEN CAST(vc AS DECIMAL(38,0)) * vc ELSE 0 END) AS q1,
         SUM(CASE WHEN event_type = '{_MW_B}'
                  THEN CAST(vc AS DECIMAL(38,0)) * vc ELSE 0 END) AS q2
  FROM b
),
v AS (
  SELECT n1, n2,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1 AS va,
         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2 AS vb,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
  FROM s
)
SELECT n1 AS n_{_MW_A}, n2 AS n_{_MW_B},
       ROUND(md / SQRT(va + vb), 4) AS t_stat,
       ROUND((va + vb) * (va + vb)
             / (va * va / (n1 - 1) + vb * vb / (n2 - 1)), 2) AS welch_dof,
       ABS(md / SQRT(va + vb)) > 1.96 AS reject_95
FROM v
""",
    doc=(
        "Welch's unequal-variance t-test on the purchase-vs-view "
        "`value` gap, with the Welch-Satterthwaite effective dof — "
        "the parametric significance member of the two-sample "
        "triangle (mannwhitney_value: distribution-free significance; "
        "cohens_d_value: magnitude). Welch never assumes the equal "
        "spread levene_value tests for — that is exactly when it "
        "replaces Student's t. Same exact centi-unit integer "
        "sufficient statistics off ONE conditional-aggregate scan as "
        "cohens_d_value (Q in DECIMAL(38,0)); t and dof are single "
        "shared double expressions, the z critical value applies at "
        "these dof (SURVEY §2.L)."
    ),
)
def welch_t_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_MW_A, _MW_B)
    )
    b = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("vc")
    )
    is1 = F.col("event_type") == _MW_A
    is2 = F.col("event_type") == _MW_B
    s = b.agg(
        F.sum(is1.cast("bigint")).cast("bigint").alias("n1"),
        F.sum(is2.cast("bigint")).cast("bigint").alias("n2"),
        F.sum(F.when(is1, F.col("vc")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is2, F.col("vc")).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(
            F.when(is1, F.col("vc").cast("decimal(38,0)") * F.col("vc")).otherwise(0)
        ).alias("q1"),
        F.sum(
            F.when(is2, F.col("vc").cast("decimal(38,0)") * F.col("vc")).otherwise(0)
        ).alias("q2"),
    )
    v = s.select(
        "n1",
        "n2",
        F.expr(
            "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1"
        ).alias("va"),
        F.expr(
            "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2"
        ).alias("vb"),
        F.expr("CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2").alias("md"),
    )
    t = F.col("md") / F.sqrt(F.col("va") + F.col("vb"))
    return v.select(
        F.col("n1").alias(f"n_{_MW_A}"),
        F.col("n2").alias(f"n_{_MW_B}"),
        F.round(t, 4).alias("t_stat"),
        F.round(
            (F.col("va") + F.col("vb"))
            * (F.col("va") + F.col("vb"))
            / (
                F.col("va") * F.col("va") / (F.col("n1") - 1)
                + F.col("vb") * F.col("vb") / (F.col("n2") - 1)
            ),
            2,
        ).alias("welch_dof"),
        (F.abs(t) > 1.96).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# price_elasticity_loglog — log-log OLS demand elasticity.
# ---------------------------------------------------------------------------


@register(
    "price_elasticity_loglog",
    oracle="""
WITH t AS (
  SELECT CAST(ROUND(ln(CAST(l_extendedprice AS DOUBLE) / l_quantity), 6)
              AS DECIMAL(18,6)) AS x,
         CAST(ROUND(ln(CAST(l_quantity AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM t
)
SELECT n AS n_lineitems,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS elasticity,
       ROUND((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
              * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) / n, 4)
           AS intercept,
       ROUND(POW(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS r2
FROM s
""",
    doc=(
        "Own-price demand elasticity via log-log OLS: slope of "
        "ln(quantity) on ln(unit price) across line items — the "
        "econometric constant-elasticity read on the pricing data, "
        "complementing ols_price_size's LEVEL-space per-brand fits "
        "(a -1.2 slope means 1% price up, 1.2% volume down). Unit "
        "price is one shared double division; both ln terms are "
        "pre-rounded to DECIMAL(18,6) (the unigram_logprob ln "
        "convention) so all five cross-moments are order-insensitive "
        "exact decimal sums; slope/intercept/R^2 are single shared "
        "double expressions. One scan, one reduce (SURVEY §2.L)."
    ),
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    t = li.select(
        F.round(
            F.log(F.col("l_extendedprice").cast("double") / F.col("l_quantity")), 6
        )
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("l_quantity").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = F.expr(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return s.select(
        F.col("n").alias("n_lineitems"),
        F.round(slope, 4).alias("elasticity"),
        F.round(
            (F.expr("CAST(sy AS DOUBLE)") - F.expr("CAST(sx AS DOUBLE)") * slope)
            / F.col("n"),
            4,
        ).alias("intercept"),
        F.round(
            F.pow(
                F.expr(
                    "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
                ),
                2,
            )
            / (
                F.expr(
                    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                )
                * F.expr(
                    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
                )
            ),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# classical_decompose_daily + mutual_information_type_hour (round 8)
# ---------------------------------------------------------------------------


@register(
    "classical_decompose_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS ed,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT d, ed, y,
         SUM(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
  FROM daily
),
dt AS (
  SELECT d, ed, y,
         CAST(ROUND(CAST(s7 AS DOUBLE) / 7, 6) AS DECIMAL(18,6)) AS trend6,
         CAST(y AS DECIMAL(18,6))
           - CAST(ROUND(CAST(s7 AS DOUBLE) / 7, 6) AS DECIMAL(18,6)) AS dtr6,
         (ed + 4) % 7 AS w
  FROM tr WHERE c7 = 7
),
sw AS (
  SELECT w, CAST(ROUND(CAST(SUM(dtr6) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS s6
  FROM dt GROUP BY w
),
adj AS (SELECT CAST(ROUND(CAST(SUM(s6) AS DOUBLE) / 7, 6) AS DECIMAL(18,6)) AS a FROM sw)
SELECT dt.d AS day, dt.y AS observed,
       CAST(dt.trend6 AS DOUBLE) AS trend,
       CAST(sw.s6 - adj.a AS DOUBLE) AS seasonal,
       CAST(dt.dtr6 - (sw.s6 - adj.a) AS DOUBLE) AS residual
FROM dt JOIN sw USING (w) CROSS JOIN adj
ORDER BY day
""",
    doc=(
        "Classical additive seasonal decomposition of the daily series "
        "(the moving-average method, Macaulay 1931 — the textbook "
        "y = trend + seasonal + residual table behind every 'is this "
        "spike real' question; seasonal_strength reports the one-number "
        "summary, this returns the full decomposition): trend = "
        "centered 7-day MA over the day-ordered DIMENSION table "
        "(integer-valued sums, exact in any order), detrended values "
        "pre-rounded to DECIMAL(18,6) so every weekday-mean seasonal "
        "index, the sum-to-zero adjustment, and the residual "
        "subtraction are EXACT decimal arithmetic — no double "
        "accumulation order anywhere after the trend division. Weekday "
        "= (epoch_day+4) mod 7 pure integer (weekday_anova "
        "convention); interior days only (the centered MA's 3-day "
        "edges are dropped, the documented classical contract). "
        "BOUND: all windows and rollups run on the O(days) dimension "
        "table (SURVEY §2.H)."
    ),
)
def classical_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("ed"),
    ).agg(F.count("*").cast("bigint").alias("y"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "ed",
        "y",
        F.sum("y").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
    )
    dt = tr.where(F.col("c7") == 7).select(
        "d",
        "y",
        F.expr("cast(round(cast(s7 as double) / 7, 6) as decimal(18,6))").alias(
            "trend6"
        ),
        F.expr(
            "cast(y as decimal(18,6))"
            " - cast(round(cast(s7 as double) / 7, 6) as decimal(18,6))"
        ).alias("dtr6"),
        F.expr("(ed + 4) % 7").alias("w"),
    )
    sw = dt.groupBy("w").agg(
        F.expr(
            "cast(round(cast(sum(dtr6) as double) / count(*), 6) as decimal(18,6))"
        ).alias("s6")
    )
    adj = sw.agg(
        F.expr("cast(round(cast(sum(s6) as double) / 7, 6) as decimal(18,6))").alias(
            "a"
        )
    )
    return (
        dt.join(F.broadcast(sw), "w")
        .crossJoin(F.broadcast(adj))
        .select(
            F.col("d").alias("day"),
            F.col("y").alias("observed"),
            F.col("trend6").cast("double").alias("trend"),
            (F.col("s6") - F.col("a")).cast("double").alias("seasonal"),
            (F.col("dtr6") - (F.col("s6") - F.col("a")))
            .cast("double")
            .alias("residual"),
        )
        .orderBy("day")
    )


@register(
    "mutual_information_type_hour",
    oracle="""
WITH c AS (
  SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mt AS (SELECT t, SUM(c) AS ct FROM c GROUP BY t),
mh AS (SELECT h, SUM(c) AS ch FROM c GROUP BY h),
n AS (SELECT SUM(c) AS nn FROM c),
terms AS (
  SELECT c.c,
         CAST(ROUND(LN((CAST(c.c AS DOUBLE) * nn) /
                       (CAST(mt.ct AS DOUBLE) * mh.ch)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM c JOIN mt USING (t) JOIN mh USING (h) CROSS JOIN n
),
ht AS (
  SELECT SUM(CAST(ct AS DECIMAL(18,0)) *
             CAST(ROUND(LN(CAST(ct AS DOUBLE) / nn), 6) AS DECIMAL(18,6))) AS s
  FROM mt CROSS JOIN n
),
hh AS (
  SELECT SUM(CAST(ch AS DECIMAL(18,0)) *
             CAST(ROUND(LN(CAST(ch AS DOUBLE) / nn), 6) AS DECIMAL(18,6))) AS s
  FROM mh CROSS JOIN n
)
SELECT CAST(n.nn AS BIGINT) AS n_events,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_cells,
       CAST((2 * CAST((SELECT SUM(CAST(c AS DECIMAL(18,0)) * lp) FROM terms)
                      * 1000000 AS HUGEINT) + n.nn)
            // (2 * CAST(n.nn AS HUGEINT)) AS BIGINT) AS mi_nats_e6,
       CAST((-2 * CAST(ht.s * 1000000 AS HUGEINT) + n.nn)
            // (2 * CAST(n.nn AS HUGEINT)) AS BIGINT) AS h_type_nats_e6,
       CAST((-2 * CAST(hh.s * 1000000 AS HUGEINT) + n.nn)
            // (2 * CAST(n.nn AS HUGEINT)) AS BIGINT) AS h_hour_nats_e6
FROM n CROSS JOIN ht CROSS JOIN hh
""",
    doc=(
        "Mutual information between event type and hour of day, with "
        "both marginal entropies (so NMI is one division away): the "
        "DEPENDENCE measure behind ks_uniform_hour's marginal "
        "uniformity test — KS asks 'is there a time-of-day effect at "
        "all', MI asks 'does WHICH event happens depend on WHEN'. "
        "Everything lives on the 5x24 contingency table: per-cell ln "
        "lift terms pre-rounded to DECIMAL(18,6), weighted by exact "
        "integer counts, summed exactly (order-free), and each statistic "
        "ships as the exact e6 integer (2*X6 + n) div (2*n) off the "
        "e6 decimal lattice — no double output; hour extraction is "
        "UTC-pinned in both engines (SURVEY §2.L)."
    ),
)
def mutual_information_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type").alias("t"), F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    mt = c.groupBy("t").agg(F.sum("c").alias("ct"))
    mh = c.groupBy("h").agg(F.sum("c").alias("ch"))
    n = c.agg(F.sum("c").alias("nn"))
    terms = (
        c.join(F.broadcast(mt), "t")
        .join(F.broadcast(mh), "h")
        .crossJoin(F.broadcast(n))
        .select(
            "c",
            F.expr(
                "cast(round(ln((cast(c as double) * nn)"
                " / (cast(ct as double) * ch)), 6) as decimal(18,6))"
            ).alias("lp"),
        )
    )
    mi = terms.agg(
        F.expr("sum(cast(c as decimal(18,0)) * lp)").alias("num"),
        F.count("*").alias("n_cells"),
    )
    ht = (
        mt.crossJoin(F.broadcast(n))
        .agg(
            F.expr(
                "sum(cast(ct as decimal(18,0)) *"
                " cast(round(ln(cast(ct as double) / nn), 6) as decimal(18,6)))"
            ).alias("s")
        )
    )
    hh = (
        mh.crossJoin(F.broadcast(n))
        .agg(
            F.expr(
                "sum(cast(ch as decimal(18,0)) *"
                " cast(round(ln(cast(ch as double) / nn), 6) as decimal(18,6)))"
            ).alias("s")
        )
    )
    return (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ht.select(F.col("s").alias("st"))))
        .crossJoin(F.broadcast(hh.select(F.col("s").alias("sh"))))
        .select(
            F.col("nn").cast("bigint").alias("n_events"),
            F.col("n_cells").cast("bigint").alias("n_cells"),
            # exact e6 integers off the e6 decimal lattice: (2*X6 + nn)
            # div (2*nn) truncates toward zero identically in both
            # engines (entropies are sign-definite; MI's tiny-negative
            # rounding residue stays consistent either way)
            F.expr(
                "CAST((CAST(2 AS DECIMAL(38,0)) * CAST(num * 1000000 AS DECIMAL(38,0))"
                " + nn) div (CAST(2 AS DECIMAL(38,0)) * nn) AS BIGINT)"
            ).alias("mi_nats_e6"),
            F.expr(
                "CAST((CAST(-2 AS DECIMAL(38,0)) * CAST(st * 1000000 AS DECIMAL(38,0))"
                " + nn) div (CAST(2 AS DECIMAL(38,0)) * nn) AS BIGINT)"
            ).alias("h_type_nats_e6"),
            F.expr(
                "CAST((CAST(-2 AS DECIMAL(38,0)) * CAST(sh * 1000000 AS DECIMAL(38,0))"
                " + nn) div (CAST(2 AS DECIMAL(38,0)) * nn) AS BIGINT)"
            ).alias("h_hour_nats_e6"),
        )
    )


# ---------------------------------------------------------------------------
# cramers_v_type_weekday — effect SIZE for the type x weekday association.
# ---------------------------------------------------------------------------


@register(
    "cramers_v_type_weekday",
    oracle="""
WITH cells AS (
  SELECT event_type AS t,
         (date_diff('second', TIMESTAMP '1970-01-01', ts) // 86400 + 4) % 7 AS wd,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, SUM(o) AS r FROM cells GROUP BY t),
ct AS (SELECT wd, SUM(o) AS c FROM cells GROUP BY wd),
tot AS (SELECT SUM(o) AS n FROM cells),
terms AS (
  SELECT (100000000 * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
                    * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c))
         // (CAST(n AS HUGEINT) * r * c) AS term_e8
  FROM cells JOIN rt USING (t) JOIN ct USING (wd) CROSS JOIN tot
),
s AS (
  SELECT (SELECT n FROM tot) AS n,
         (SELECT COUNT(*) FROM rt) AS nr,
         (SELECT COUNT(*) FROM ct) AS nc,
         SUM(term_e8) AS chi2_e8,
         COUNT(*) AS n_cells
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       CAST(CAST(chi2_e8 AS HUGEINT) AS VARCHAR) AS chi2_e8,
       CAST((10 * chi2_e8) // (CAST(n AS HUGEINT) * LEAST(nr - 1, nc - 1))
            AS BIGINT) AS v_sq_e9
FROM s
""",
    doc=(
        "Cramér's V for event type x weekday: the EFFECT SIZE the "
        "chi-squared tests never report — priority_status_chi2 and "
        "mutual_information_type_hour say whether an association "
        "exists; V in [0,1] says whether it is big enough to act on "
        "(at pretraining-corpus n, chi2 rejects on trivia). Same "
        "distributed shape as priority_status_chi2: one map-side-"
        "combined contingency pass, dimension-sized margins. Fully "
        "integer presentation (the r9 ks_stat red killed the "
        "unrounded-IEEE-tree convention): each (O-E)^2/E term is the "
        "exact truncating integer (10^8*dev^2) div (n*r*c) with dev = "
        "n*o - r*c in HUGEINT/DECIMAL(38,0) (exact while |dev| < "
        "~10^15, i.e. cell deviation under ~1000x expected at n=1e12), "
        "chi2_e8 is their order-free integer sum, and V ships SQUARED "
        "as v_sq_e9 = (10*chi2_e8) div (n*min(r-1,c-1)) — sqrt is the "
        "caller's last-mile op. Weekday from the (day_idx+4)%7 UTC "
        "convention (SURVEY §2.L)."
    ),
)
def cramers_v_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("t"),
        F.expr(
            "(unix_micros(cast(ts as timestamp)) div 1000000 div 86400 + 4) % 7"
        ).alias("wd"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = cells.groupBy("t").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("wd").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("n"))
    # exact truncating integer term in DECIMAL(38,0): dev = n*o - r*c
    term = F.expr(
        "(CAST(100000000 AS DECIMAL(38,0))"
        " * (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)"
        " * (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c))"
        " div (CAST(n AS DECIMAL(38,0)) * r * c)"
    )
    joined = (
        cells.join(F.broadcast(rt), "t")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(tot))
    )
    n_r = rt.agg(F.count("*").alias("nr"))
    n_c = ct.agg(F.count("*").alias("nc"))
    return (
        joined.agg(
            F.max("n").alias("n"),
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(term).alias("chi2_e8"),
        )
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
        .select(
            F.col("n").cast("bigint").alias("n_events"),
            "n_cells",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
            # digit-string presentation: DECIMAL(38,0) output columns
            # hash-mismatch across engines in type-faithful client
            # layers (pandas renders DuckDB decimals as float64 — the
            # r10 driver red); strings are conversion-invariant and
            # lossless at any scale
            F.col("chi2_e8").cast("decimal(38,0)").cast("string").alias("chi2_e8"),
            F.expr(
                "CAST((CAST(10 AS DECIMAL(38,0)) * chi2_e8)"
                " div (CAST(n AS DECIMAL(38,0)) * least(nr - 1, nc - 1)) AS BIGINT)"
            ).alias("v_sq_e9"),
        )
    )


# ---------------------------------------------------------------------------
# uncertainty_coeff_type_hour — normalized, asymmetric MI (Theil's U).
# ---------------------------------------------------------------------------


@register(
    "uncertainty_coeff_type_hour",
    oracle="""
WITH c AS (
  SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mt AS (SELECT t, SUM(c) AS ct FROM c GROUP BY t),
mh AS (SELECT h, SUM(c) AS ch FROM c GROUP BY h),
n AS (SELECT SUM(c) AS nn FROM c),
terms AS (
  SELECT c.c,
         CAST(ROUND(LN((CAST(c.c AS DOUBLE) * nn) /
                       (CAST(mt.ct AS DOUBLE) * mh.ch)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM c JOIN mt USING (t) JOIN mh USING (h) CROSS JOIN n
),
s AS (
  SELECT (SELECT SUM(CAST(c AS DECIMAL(18,0)) * lp) FROM terms) AS num,
         (SELECT -SUM(CAST(ct AS DECIMAL(18,0)) *
                      CAST(ROUND(LN(CAST(ct AS DOUBLE) / nn), 6)
                           AS DECIMAL(18,6)))
          FROM mt CROSS JOIN n) AS ht,
         (SELECT -SUM(CAST(ch AS DECIMAL(18,0)) *
                      CAST(ROUND(LN(CAST(ch AS DOUBLE) / nn), 6)
                           AS DECIMAL(18,6)))
          FROM mh CROSS JOIN n) AS hh,
         (SELECT nn FROM n) AS nn,
         (SELECT COUNT(*) FROM c) AS n_cells
)
SELECT CAST(nn AS BIGINT) AS n_events,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST((1000::HUGEINT * CAST(num * 1000000 AS HUGEINT))
            // CAST(ht * 1000000 AS HUGEINT) AS BIGINT)
           AS u_type_given_hour_milli,
       CAST((1000::HUGEINT * CAST(num * 1000000 AS HUGEINT))
            // CAST(hh * 1000000 AS HUGEINT) AS BIGINT)
           AS u_hour_given_type_milli
FROM s
""",
    doc=(
        "Theil's uncertainty coefficient U(type|hour) and U(hour|type) "
        "— the NORMALIZED, asymmetric companion to "
        "mutual_information_type_hour: MI in nats depends on the "
        "marginals' scale, U = MI/H answers 'what fraction of the "
        "uncertainty in WHICH event is removed by knowing WHEN' (and "
        "vice versa) on a fixed [0,1] scale a mixture dashboard can "
        "threshold. Rides the same 5x24 contingency machinery: ln "
        "terms pre-rounded to DECIMAL(18,6), exact integer-weighted "
        "order-free sums; the ratios ship as pure-integer milli-units "
        "(1000*MI_dec) div H_dec over the recovered *10^6 integers "
        "(HUGEINT / DECIMAL(38,0) — BIGINT overflows at corpus n), no "
        "final ROUND(double) (SURVEY §2.L)."
    ),
)
def uncertainty_coeff_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type").alias("t"), F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    mt = c.groupBy("t").agg(F.sum("c").alias("ct"))
    mh = c.groupBy("h").agg(F.sum("c").alias("ch"))
    n = c.agg(F.sum("c").alias("nn"))
    terms = (
        c.join(F.broadcast(mt), "t")
        .join(F.broadcast(mh), "h")
        .crossJoin(F.broadcast(n))
        .select(
            "c",
            F.expr(
                "cast(round(ln((cast(c as double) * nn)"
                " / (cast(ct as double) * ch)), 6) as decimal(18,6))"
            ).alias("lp"),
        )
    )
    mi = terms.agg(
        F.expr("sum(cast(c as decimal(18,0)) * lp)").alias("num"),
        F.count("*").cast("bigint").alias("n_cells"),
    )
    ht = mt.crossJoin(F.broadcast(n)).agg(
        F.expr(
            "-sum(cast(ct as decimal(18,0)) *"
            " cast(round(ln(cast(ct as double) / nn), 6) as decimal(18,6)))"
        ).alias("ht")
    )
    hh = mh.crossJoin(F.broadcast(n)).agg(
        F.expr(
            "-sum(cast(ch as decimal(18,0)) *"
            " cast(round(ln(cast(ch as double) / nn), 6) as decimal(18,6)))"
        ).alias("hh")
    )
    return (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ht))
        .crossJoin(F.broadcast(hh))
        .select(
            F.col("nn").cast("bigint").alias("n_events"),
            "n_cells",
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0))"
                " * CAST(num * 1000000 AS DECIMAL(38,0)))"
                " div CAST(ht * 1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("u_type_given_hour_milli"),
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0))"
                " * CAST(num * 1000000 AS DECIMAL(38,0)))"
                " div CAST(hh * 1000000 AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("u_hour_given_type_milli"),
        )
    )

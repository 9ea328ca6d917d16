"""Relational analytics core (SURVEY.md §2.G).

These exercise the join/aggregate engine that backs every reference
API call (reference: src/database.py's SQL surface). Shapes follow the
classic TPC-H queries so plan quality is easy to judge:

- aggregates over the fact table use DECIMAL(18,4)-exact partial
  aggregation (map-side combine, order-insensitive → bit-stable at any
  parallelism);
- dimension joins are broadcast (region/nation/customer/supplier are
  tiny relative to facts at every scale factor);
- every LIMIT has a total ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.io import load_table, parallelize_scan
from email_etl_spark.plans.registry import register

DEC = "decimal(18,4)"


def _disc_price(dec: str = DEC):
    # l_extendedprice * (1 - l_discount), exact decimal arithmetic
    return F.col("l_extendedprice").cast("decimal(12,4)") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(6,4)")


@register(
    "q1_pricing_summary",
    headline=True,
    oracle="""
SELECT
  l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4)) * CAST(1.0 + l_tax AS DECIMAL(6,4))), 4) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: wide exact aggregation over the fact table (ref: src/database.py stats surface).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    qty_dec = F.col("l_quantity").cast(DEC)
    price_dec = F.col("l_extendedprice").cast(DEC)
    disc_price = _disc_price()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax")).cast("decimal(6,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_dec).cast("double").alias("sum_qty"),
            F.sum(price_dec).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            (F.sum(qty_dec).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price_dec).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(DEC)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    headline=True,
    oracle="""
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    doc="3-way join + agg + top-N; customer dim is broadcast, fact-fact join shuffles on orderkey.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    headline=True,
    oracle="""
SELECT n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="Snowflake rollup: all dims broadcast; single fact shuffle on orderkey.",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "top_customers",
    headline=True,
    oracle="""
SELECT c_custkey, c_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
  COUNT(*) AS order_count
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 20
""",
    doc="Revenue top-N with broadcast dim join (ref: emails_by_provider-style rollup, src/database.py:333).",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spent"),
            F.count("*").alias("order_count"),
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(20)
    )


@register(
    "priority_monthly",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS month_value
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="Month × priority matrix (ref: analyze_email_patterns group_by=week/day shape).",
)
def priority_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("month_value"),
        )
        .orderBy("order_month", "o_orderpriority")
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name, c_acctbal,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc=(
        "TPC-H Q10 shape: returned-revenue per customer over a quarter "
        "(the 'problem customers' report behind the reference's "
        "analyze_email_patterns-style rollups). Customer/nation broadcast, "
        "one fact-fact shuffle on orderkey, top-20 via "
        "TakeOrderedAndProject."
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc=(
        "TPC-H Q12 shape (adapted to the synthetic schema): urgent-vs-"
        "normal lineitem counts per return flag over a ship year — "
        "fact-fact join + conditional aggregation. The shipdate filter "
        "pushes to the lineitem scan; the single shuffle is the orderkey "
        "join; the groupBy output is 3 rows so its exchange is trivial."
    ),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name
ORDER BY cust_nation, supp_nation
""",
    doc=(
        "TPC-H Q7 shape: cross-nation trade-volume matrix (customer "
        "nation x supplier nation, excluding domestic). All four dims "
        "broadcast; the only big shuffle is lineitem joining orders on "
        "orderkey; the pair-grouped aggregate is map-side combined."
    ),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation")
    )


@register(
    "part_type_revenue",
    oracle="""
WITH j AS (
  SELECT p_type,
         ROUND(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4)), 4) AS disc4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
),
g AS (SELECT p_type, SUM(disc4) AS rev FROM j GROUP BY p_type),
u AS (SELECT p_type, rev, CAST(rev * 10000 AS BIGINT) AS units FROM g)
SELECT p_type,
       CAST(rev AS DOUBLE) AS revenue,
       CAST((units * 10000) // SUM(units) OVER () AS BIGINT) AS share_bps
FROM u ORDER BY p_type
""",
    doc=(
        "TPC-H Q14 shape generalized: revenue per part type for a ship "
        "year with each type's share of total in EXACT integer bps "
        "(scale-4 decimals converted to integer units; integer division "
        "only — no float ratio can split the engines). Part dim "
        "broadcast; one orderkey-free scan-side shuffle on the groupBy."
    ),
)
def part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    disc4 = F.round(_disc_price(), 4).cast("decimal(18,4)")
    g = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(F.sum(disc4).alias("rev"))
    )
    u = g.select(
        "p_type", "rev", (F.col("rev") * 10000).cast("bigint").alias("units")
    )
    # total via a single-partition window over the 6 grouped rows only,
    # never over fact rows
    return (
        u.select(
            "p_type",
            F.col("rev").cast("double").alias("revenue"),
            F.expr("CAST((units * 10000) DIV SUM(units) OVER () AS BIGINT)").alias("share_bps"),
        )
        .orderBy("p_type")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    doc=(
        "TPC-H Q6 shape: pure pushed-predicate scan + exact-decimal "
        "aggregate, zero joins — every filter reaches the parquet reader "
        "(PushedFilters), so at 100 TB only matching row groups are read."
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    rev = F.col("l_extendedprice").cast("decimal(12,4)") * F.col("l_discount").cast("decimal(6,4)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(rev), 4).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc=(
        "TPC-H Q13 shape: customer order-count distribution — left outer "
        "join (null-preserving) then a two-level aggregation. The second "
        "agg's shuffle carries at most distinct(c_count) rows."
    ),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = parallelize_scan(load_table(spark, sf_dir, "orders"))
    co = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST((200 * CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000 AS HUGEINT)
             + 70000)
            // 140000 AS BIGINT) AS avg_yearly_centi,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12' AND p.p_size <= 15
  AND CAST(l.l_quantity AS DECIMAL(18,4)) * 5 * pa.cnt < pa.sq
""",
    doc=(
        "TPC-H Q17 shape: small-quantity outlier revenue — the correlated "
        "'qty < 0.2*avg(qty) per part' subquery becomes a per-part "
        "aggregate joined back to the fact. The 0.2*avg boundary is an "
        "EXACT decimal cross-multiplication (5*qty*cnt < sum), immune to "
        "distributed-vs-sequential float summation order; avg_yearly "
        "ships as the exact half-up centi integer (no /7.0 double). The per-part "
        "agg runs only over parts passing the (broadcast) dim filter."
    ),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    parts = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 15)
    )
    li_f = li.join(F.broadcast(parts.select("p_partkey")), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    pa = li_f.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sq"), F.count("*").alias("cnt")
    )
    joined = li_f.join(pa, "l_partkey").where(
        F.col("l_quantity").cast(DEC) * 5 * F.col("cnt") < F.col("sq")
    )
    # exact half-up centi units: (2*100*S*10^4 + 7*10^4) div (14*10^4)
    # over the e4 decimal lattice — no double division by 7.0
    return joined.agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("s"),
        F.count("*").alias("n_lines"),
    ).select(
        F.expr(
            "CAST((CAST(200 AS DECIMAL(38,0)) * CAST(s * 10000 AS DECIMAL(38,0))"
            " + 70000) div 140000 AS BIGINT)"
        ).alias("avg_yearly_centi"),
        "n_lines",
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(big.total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100
""",
    doc=(
        "TPC-H Q18 shape: large-volume orders — HAVING over the fact "
        "aggregate, then joins back to orders/customer. The >300 filter "
        "shrinks the agg output to a sliver before any join, and the "
        "top-100 is TakeOrderedAndProject (each task returns ≤100 rows)."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l.l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs disjunctive predicates across the "
        "part dim and the fact — Catalyst derives the per-side residues "
        "(p_size<=15, quantity ranges) and pushes them below the "
        "broadcast join, so neither side scans rows no branch can match."
    ),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    rev = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)")
    return j.where(cond).agg(
        F.round(F.sum(rev), 4).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
),
eligible AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c CROSS JOIN pos
  WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * pos.n > pos.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM eligible GROUP BY c_nationkey ORDER BY c_nationkey
""",
    doc=(
        "TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders, rolled up per nation — scalar-subquery average (exact "
        "cross-multiplied decimal, no float boundary), anti-join against "
        "the date-filtered orders (pushed predicate), single rollup. The "
        "1-row average broadcast replaces TPC-H's correlated subquery."
    ),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = parallelize_scan(load_table(spark, sf_dir, "orders"))
    pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("s"), F.count("*").alias("n")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    eligible = (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast(DEC) * F.col("n") > F.col("s"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        eligible.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q8_market_share",
    oracle="""
WITH rev AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l.l_discount AS DECIMAL(6,4)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON o.o_orderkey = l.l_orderkey
  JOIN customer c  ON c.c_custkey = o.o_custkey
  JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
  JOIN region r    ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s  ON s.s_suppkey = l.l_suppkey
  JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
  JOIN part p      ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0.0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) AS nation_rev,
       CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS total_rev,
       CAST((2000000 * CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                     ELSE CAST(0.0 AS DECIMAL(12,4)) END) * 10000 AS HUGEINT)
             + CAST(SUM(volume) * 10000 AS HUGEINT))
            // (2 * CAST(SUM(volume) * 10000 AS HUGEINT))
            AS BIGINT) AS mkt_share_ppm
FROM rev GROUP BY o_year ORDER BY o_year
""",
    doc=(
        "TPC-H Q8 shape: national market share by order year — the "
        "two-role nation dim (customer-side region filter, supplier-side "
        "share numerator) joins broadcast twice; the only fact-fact "
        "shuffle is lineitem⋈orders. Share ships as the exact half-up "
        "integer ppm of the two exact decimal sums, deterministic at "
        "any parallelism (no double division)."
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    orders = parallelize_scan(load_table(spark, sf_dir, "orders"))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")

    cn = nation.alias("cn")
    sn = nation.alias("sn")
    cust_in_region = (
        cust.join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey")
    ).select("s_suppkey", F.col("sn.n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_in_region, orders.o_custkey == cust_in_region.c_custkey)
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0).cast("decimal(12,4)")
    )
    agg = rev.groupBy("o_year").agg(
        F.sum(nat_vol).alias("nat_dec"),
        F.sum("volume").alias("tot_dec"),
    )
    # share ships as the exact half-up integer ppm of the two e4
    # decimal sums — no double division (the r9 ks_stat lesson)
    return agg.select(
        "o_year",
        F.round(F.col("nat_dec"), 4).cast("double").alias("nation_rev"),
        F.round(F.col("tot_dec"), 4).cast("double").alias("total_rev"),
        F.expr(
            "CAST((CAST(2000000 AS DECIMAL(38,0)) * CAST(nat_dec * 10000 AS DECIMAL(38,0))"
            " + CAST(tot_dec * 10000 AS DECIMAL(38,0)))"
            " div (CAST(2 AS DECIMAL(38,0)) * CAST(tot_dec * 10000 AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("mkt_share_ppm"),
    ).orderBy("o_year")


@register(
    "q15_top_supplier",
    oracle="""
WITH srev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
),
m AS (SELECT MAX(total_rev) AS max_rev FROM srev)
SELECT s.s_suppkey, s.s_name,
       CAST(ROUND(srev.total_rev, 4) AS DOUBLE) AS total_rev
FROM srev CROSS JOIN m
JOIN supplier s ON s.s_suppkey = srev.l_suppkey
WHERE srev.total_rev = m.max_rev
ORDER BY s.s_suppkey
""",
    doc=(
        "TPC-H Q15 shape: top supplier by quarterly revenue — the "
        "revenue 'view' is one pushed-date-filter aggregate, the max is "
        "a 1-row broadcast rejoined to the view (no second scan of the "
        "fact), and the equality keeps ties exactly (decimal compare)."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    supp = load_table(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)")
    srev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(vol).alias("total_rev"))
    )
    m = srev.agg(F.max("total_rev").alias("max_rev"))
    return (
        srev.crossJoin(F.broadcast(m))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 4).cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS profit
FROM lineitem JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, o_year ORDER BY n_name, o_year DESC
""",
    doc=(
        "TPC-H Q9 shape: product-line profit by supplier nation and "
        "order year (ref: src/database.py rollup surface). The LIKE "
        "filter prunes the part dim before the join, so only matching "
        "partkeys ship; part/supplier/nation broadcast at test SFs, and "
        "when part outgrows the broadcast threshold at extreme scale "
        "the same plan degrades to a shuffle join on partkey (AQE "
        "decides from size stats). The only fact-fact shuffle is "
        "lineitem joining orders on orderkey."
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F' AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
),
multi AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1
),
sole AS (
  SELECT l_orderkey, MIN(l_suppkey) AS only_supp
  FROM late GROUP BY l_orderkey HAVING COUNT(*) = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM sole JOIN multi USING (l_orderkey)
JOIN supplier ON only_supp = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
""",
    doc=(
        "TPC-H Q21 shape: suppliers who were the sole late shipper on a "
        "multi-supplier finished order ('late' = shipped >45 days after "
        "order date; this corpus has no commit/receipt dates). The "
        "classic EXISTS / NOT-EXISTS correlated-subquery chain is "
        "decorrelated into two aggregations — distinct late (order, "
        "supplier) pairs reduced per order, and a per-order distinct- "
        "supplier count — joined on orderkey, so there is no correlated "
        "re-scan of the fact and every shuffle is on the same orderkey "
        "the aggregates already partition by. Supplier dim broadcasts."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders_f, li.l_orderkey == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .where(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    sole = (
        late.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_late"), F.min("l_suppkey").alias("only_supp"))
        .where(F.col("n_late") == 1)
        .select("l_orderkey", "only_supp")
    )
    return (
        sole.join(multi, "l_orderkey")
        .join(F.broadcast(supp.select("s_suppkey", "s_name")), F.col("only_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH sc AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice / l_quantity, 4) AS DECIMAL(18,4))) AS cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
),
asia_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
costs AS (
  SELECT p_partkey, sc.cost, a.s_name, a.s_acctbal, a.n_name
  FROM part JOIN sc ON p_partkey = sc.l_partkey
            JOIN asia_supp a ON sc.l_suppkey = a.s_suppkey
  WHERE p_size < 15 AND p_type = 'STANDARD'
),
mins AS (SELECT p_partkey, MIN(cost) AS min_cost FROM costs GROUP BY 1)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, CAST(c.cost AS DOUBLE) AS cost
FROM costs c JOIN mins m ON c.p_partkey = m.p_partkey AND c.cost = m.min_cost
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey LIMIT 100
""",
    doc=(
        "TPC-H Q2 shape: min-cost supplier per part within a region. "
        "This corpus has no partsupp table, so supply cost derives "
        "from lineitem (observed min unit price per part-supplier "
        "pair, rounded to exact DECIMAL before the min so the "
        "min-equality rejoin can never fp-miss). Min-per-group + "
        "equality join-back — the grouped twin of q15's global max. "
        "Region-filtered supplier dim broadcasts; both aggs and the "
        "rejoin share the partkey shuffle key."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") < 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    sc = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4).cast("decimal(18,4)")
            ).alias("cost")
        )
    )
    asia = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        sc.join(F.broadcast(part.select("p_partkey")), sc.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(asia), sc.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "cost", "s_name", "s_acctbal", "n_name")
    )
    mins = (
        costs.groupBy("p_partkey")
        .agg(F.min("cost").alias("min_cost"))
        .withColumnRenamed("p_partkey", "mk")
    )
    return (
        costs.join(
            mins,
            (F.col("p_partkey") == F.col("mk")) & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(6,1))) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 3 GROUP BY 1
),
t AS (SELECT SUM(val) AS total FROM v)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM v CROSS JOIN t WHERE 1000 * val > total
ORDER BY part_value DESC, p_partkey
""",
    doc=(
        "TPC-H Q11 shape: parts representing an outsized share of one "
        "nation's traded value (partsupp-free: value = shipped "
        "price x quantity). The HAVING-over-scalar-subquery threshold "
        "is evaluated as pure decimal integer arithmetic "
        "(1000*val > total) — no double boundary to diverge on — with "
        "the grand total a 1-row broadcast over the per-part rollup."
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    val = F.col("l_extendedprice").cast("decimal(12,4)") * F.col("l_quantity").cast("decimal(6,1)")
    v = (
        li.join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    t = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(t))
        .where(F.lit(1000) * F.col("val") > F.col("total"))
        .select(F.col("l_partkey").alias("p_partkey"), F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q16_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc=(
        "TPC-H Q16 shape: how many distinct suppliers can source each "
        "(brand, type, size) bucket (partsupp-free: supply "
        "relationships observed from lineitem). COUNT(DISTINCT) over "
        "a broadcast-pruned part dim; Spark plans distinct-count as a "
        "two-level partial aggregate, so the shuffle carries "
        "(group, suppkey) pairs, not lineitem rows."
    ),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promo_suppliers",
    oracle="""
WITH elig AS (
  SELECT DISTINCT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 30
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM elig)
ORDER BY s_name
""",
    doc=(
        "TPC-H Q20 shape: suppliers with a concentrated position in a "
        "promoted part family (shipped >30 units of some red part in "
        "1997). The nested-IN chain decorrelates to a grouped HAVING "
        "feeding a left-semi join — the fact table is scanned once "
        "with part and date filters pushed, and the eligible-supplier "
        "set (tiny by construction) broadcasts into the semi join."
    ),
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    elig = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(elig), supp.s_suppkey == elig.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q14_promo_revenue",
    oracle="""
WITH j AS (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1.0 - l_discount AS DECIMAL(6,4)) AS disc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT CAST((2000000 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc
                                   ELSE CAST(0 AS DECIMAL(12,4)) END) * 10000 AS HUGEINT)
             + CAST(SUM(disc) * 10000 AS HUGEINT))
            // (2 * CAST(SUM(disc) * 10000 AS HUGEINT)) AS BIGINT)
           AS promo_revenue_ppm,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT)
         AS promo_items
FROM j
""",
    doc=(
        "TPC-H Q14 shape (promotion-effect revenue share) — the last "
        "of the 22 TPC-H queries, completing §G's full sweep: one "
        "month of lineitem joined to the part dim (broadcast), promo "
        "share of discounted revenue as a conditional-aggregate ratio "
        "shipped as the exact half-up integer ppm of two exact "
        "DECIMAL sums (no double division); the shipdate predicate pushes to "
        "the scan so only the month's row groups are read."
    ),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).alias("p_dec"),
            F.sum(disc).alias("t_dec"),
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.when(F.col("p_type") == "PROMO", 1).otherwise(0))
            .cast("bigint")
            .alias("promo_items"),
        )
        # exact half-up integer ppm of the two e4 decimal sums
        .select(
            F.expr(
                "CAST((CAST(2000000 AS DECIMAL(38,0))"
                " * CAST(p_dec * 10000 AS DECIMAL(38,0))"
                " + CAST(t_dec * 10000 AS DECIMAL(38,0)))"
                " div (CAST(2 AS DECIMAL(38,0))"
                " * CAST(t_dec * 10000 AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("promo_revenue_ppm"),
            "n_items",
            "promo_items",
        )
    )

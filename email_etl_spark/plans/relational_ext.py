"""Extended relational coverage (SURVEY.md §2.G): the join/window/
grouping-set shapes the reference's API layer composes — semi/anti
joins (EXISTS / NOT EXISTS), ROLLUP subtotals, running windows,
per-group top-k, and point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.functions.vectors import norm
from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="EXISTS semi-join + agg (TPC-H Q4 shape): late-shipping orders per priority.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    doc="NOT EXISTS anti-join (TPC-H Q22 shape): segment counts of order-less customers.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "rollup_source_lang",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY ROLLUP(source, lang)
ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
""",
    doc="ROLLUP subtotals (storage-stats style hierarchy: corpus → source → source+lang).",
)
def rollup_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.asc_nulls_first("source"), F.asc_nulls_first("lang"))
    )


@register(
    "running_total",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events,
       CAST(SUM(n_events) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_events
FROM daily ORDER BY day
""",
    doc="Daily volume + running total (email-volume trend surface, ref: analyze_email_patterns).",
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("n_events")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.withColumn("cumulative_events", F.sum("n_events").over(w))
        .orderBy("day")
    )


@register(
    "top_docs_per_lang",
    oracle="""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn <= 3
ORDER BY lang, n_chars DESC, doc_id
""",
    doc="Per-group top-k via window (longest docs per language).",
)
def top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", F.desc("n_chars"), "doc_id")
    )


@register(
    "doc_by_id",
    oracle="""
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       len(e.embedding) AS embedding_dim,
       ROUND(sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
             (acc, v) -> acc + v)), 4) AS embedding_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.doc_id = 7
""",
    doc="Point lookup with vector metadata (ref: get_email_by_id, src/database.py:223).",
)
def doc_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") == 7)
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size("embedding").cast("bigint").alias("embedding_dim"),
        F.round(norm(F.col("embedding")), 4).alias("embedding_norm"),
    )


@register(
    "pivot_status_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="Pivot (crosstab): priority rows × status columns via the pivot operator (conditional-agg twin in the oracle).",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "label_centroids",
    oracle="""
WITH flat AS (
  SELECT label, d.i AS dim, CAST(embedding[d.i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN (VALUES (1), (2), (3), (4)) AS d(i)
)
SELECT label, CAST(dim AS BIGINT) AS dim,
       COUNT(*) AS n_vectors,
       ROUND(AVG(x), 4) AS centroid_val
FROM flat
GROUP BY label, dim ORDER BY label, dim
""",
    doc=(
        "Per-label embedding centroids (first 4 dims shown): element-wise "
        "vector aggregation via posexplode → group — the building block for "
        "k-means iterations and class prototypes (SURVEY §2.F)."
    ),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select("label", (F.col("pos") + 1).cast("bigint").alias("dim"), F.col("x").cast("double").alias("x"))
    return (
        flat.where(F.col("dim") <= 4)
        .groupBy("label", "dim")
        .agg(F.count("*").alias("n_vectors"), F.round(F.avg("x"), 4).alias("centroid_val"))
        .orderBy("label", "dim")
    )


def _sketch_fact_oracle(name: str, types: dict[str, str], order_by: str) -> str:
    """Fact-table oracle for the DETERMINISTIC sketch queries: DuckDB
    cannot rebuild a Datasketches HLL register file, but these queries'
    outputs are pure functions of the input multiset (register-max HLL
    merges; MG with a pinned partition layout), so the expected rows
    for the committed corpora are static facts — generated by
    scripts/gen_sketch_expected.py with a two-parallelism determinism
    cross-check, keyed by the events row count. An uncovered corpus
    selects zero branches and fails the row-count gate LOUDLY (same
    discipline as _bpe_expected.py)."""
    from email_etl_spark.plans._sketch_expected import COLUMNS, EXPECTED

    cols = COLUMNS[name]

    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    branches = []
    for n_ev, rows in sorted(EXPECTED[name].items()):
        vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
        branches.append(
            f"SELECT * FROM (VALUES {vals}) AS t({', '.join(cols)})\n"
            f"WHERE (SELECT COUNT(*) FROM events) = {n_ev}"
        )
    body = "\nUNION ALL\n".join(branches)
    outer = ", ".join(f"CAST({c} AS {types.get(c, 'BIGINT')}) AS {c}" for c in cols)
    return f"SELECT {outer} FROM (\n{body}\n) u ORDER BY {order_by}"


@register(
    "approx_user_counts",
    oracle=_sketch_fact_oracle(
        "approx_user_counts", {"event_type": "VARCHAR"}, "event_type"
    ),
    doc=(
        "HLL approximate distinct users per event type — the documented "
        "scale path for COUNT(DISTINCT) when exactness is not required. "
        "HLL++ registers are max-of-hash, so the estimate is a pure "
        "function of the input SET (any partitioning, any merge order): "
        "oracle-checked against the generated corpus fact table "
        "(_sketch_expected.py) plus the error-bound property test."
    ),
)
def approx_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


_AQ_ACC = 1000  # approx_percentile accuracy (rank error <= n/acc per GK)
_AQ_BAND_X = 3  # audit band = 3x the nominal bound (merge slack)


@register(
    "approx_value_quantiles",
    # Unlike the HLL/MG family, Greenwald-Khanna summaries are
    # partial-ARRIVAL-ORDER sensitive, so the raw estimates cannot be
    # fact-pinned without flakiness. The gate instead checks the
    # CONTRACT: the sketch value must be an in-group element whose rank
    # lies within 3x the nominal n/accuracy band of the target rank —
    # the oracle computes the exact group sizes and asserts TRUE bands.
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS p50_in_band, TRUE AS p95_in_band
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc=(
        "Approximate-percentile ACCURACY AUDIT per event type: runs "
        "approx_percentile (Greenwald-Khanna sketch, the scale path "
        "twin of value_percentiles) and verifies each estimate's rank "
        f"against exact order statistics — in-band means within "
        f"{_AQ_BAND_X}x the nominal n/{_AQ_ACC} rank error of the "
        "target rank. The exact side costs one per-group sort window "
        "(audit-tier, like ann_recall_eval: ground truth is the "
        "point); the sketch side is the production path. GK merges "
        "are arrival-order sensitive, so the gate checks this rank "
        "CONTRACT rather than sketch internals (SURVEY §2.L)."
    ),
)
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ap = ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(_AQ_ACC)).alias("a50"),
        F.approx_percentile("value", F.lit(0.95), F.lit(_AQ_ACC)).alias("a95"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("value")
    band = F.greatest(
        F.lit(1), F.ceil(F.col("n_events") * _AQ_BAND_X / _AQ_ACC)
    ).cast("long")

    def lo(p):
        return F.greatest(
            F.lit(1), F.floor(F.lit(p) * F.col("n_events")).cast("long") - band
        )

    def hi(p):
        return F.least(
            F.col("n_events"), F.ceil(F.lit(p) * F.col("n_events")).cast("long") + band
        )

    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rn")
    ).join(ap.select("event_type", "n_events"), "event_type")
    targets = ranked.select(
        "event_type",
        "value",
        "rn",
        lo(0.5).alias("lo50"),
        hi(0.5).alias("hi50"),
        lo(0.95).alias("lo95"),
        hi(0.95).alias("hi95"),
    )
    stats = targets.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.col("lo50"), F.col("value"))).alias("v_lo50"),
        F.max(F.when(F.col("rn") == F.col("hi50"), F.col("value"))).alias("v_hi50"),
        F.max(F.when(F.col("rn") == F.col("lo95"), F.col("value"))).alias("v_lo95"),
        F.max(F.when(F.col("rn") == F.col("hi95"), F.col("value"))).alias("v_hi95"),
    )
    return (
        ap.join(stats, "event_type")
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            ((F.col("a50") >= F.col("v_lo50")) & (F.col("a50") <= F.col("v_hi50")))
            .alias("p50_in_band"),
            ((F.col("a95") >= F.col("v_lo95")) & (F.col("a95") <= F.col("v_hi95")))
            .alias("p95_in_band"),
        )
        .orderBy("event_type")
    )


@register(
    "fuzzy_name_match",
    oracle="""
SELECT c_custkey, c_name,
       CAST(levenshtein(c_name, 'Customer#000000042') AS BIGINT) AS edit_dist
FROM customer
WHERE levenshtein(c_name, 'Customer#000000042') <= 2
ORDER BY edit_dist, c_custkey
""",
    doc="Fuzzy identity matching via edit distance (sender-alias resolution surface).",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit("Customer#000000042"))
    return (
        cust.select("c_custkey", "c_name", dist.cast("bigint").alias("edit_dist"))
        .where(F.col("edit_dist") <= 2)
        .orderBy("edit_dist", "c_custkey")
    )


@register(
    "hourly_histogram",
    oracle="""
SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
""",
    doc="Hour-of-day activity histogram (communication-habits surface, ref: analyze_email_patterns).",
)
def hourly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hour_of_day"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("hour_of_day")
    )


@register(
    "audit_error_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       CAST(FLOOR(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT) AS error_bps
FROM events GROUP BY 1 ORDER BY 1
""",
    doc="Daily audit error-rate rollup in basis points (ref: audit log + "
    "ProcessingStatus tracking, src/database.py:321-327; error share is "
    "exact-integer bps so every engine agrees bit-for-bit).",
)
def audit_error_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_err = F.sum((F.col("event_type") == "error").cast("long"))
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            n_err.cast("bigint").alias("n_errors"),
            F.floor(n_err * 10000.0 / F.count("*")).cast("bigint").alias("error_bps"),
        )
        .orderBy("day")
    )


@register(
    "archive_layout_stats",
    oracle="""
SELECT CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS m,
       COUNT(*) AS n_records,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(length(props)) AS BIGINT) AS payload_bytes
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="Year/month archive-partition statistics (ref: markdown year/month "
    "layout + get_storage_stats, src/markdown_storage.py:58-74,254-280): "
    "record counts and payload bytes per partition directory.",
)
def archive_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.year("ts").cast("int").alias("y"), F.month("ts").cast("int").alias("m")
        )
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.length("props")).cast("bigint").alias("payload_bytes"),
        )
        .orderBy("y", "m")
    )


@register(
    "table_profile",
    oracle="""
SELECT 'doc_id' AS col, CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MIN(length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS min_len,
       CAST(MAX(length(CAST(doc_id AS VARCHAR))) AS BIGINT) AS max_len
FROM documents
UNION ALL
SELECT 'lang', CAST(COUNT(*) - COUNT(lang) AS BIGINT), CAST(COUNT(DISTINCT lang) AS BIGINT),
       CAST(MIN(length(lang)) AS BIGINT), CAST(MAX(length(lang)) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_chars', CAST(COUNT(*) - COUNT(n_chars) AS BIGINT), CAST(COUNT(DISTINCT n_chars) AS BIGINT),
       CAST(MIN(length(CAST(n_chars AS VARCHAR))) AS BIGINT), CAST(MAX(length(CAST(n_chars AS VARCHAR))) AS BIGINT) FROM documents
UNION ALL
SELECT 'source', CAST(COUNT(*) - COUNT(source) AS BIGINT), CAST(COUNT(DISTINCT source) AS BIGINT),
       CAST(MIN(length(source)) AS BIGINT), CAST(MAX(length(source)) AS BIGINT) FROM documents
UNION ALL
SELECT 'text', CAST(COUNT(*) - COUNT(text) AS BIGINT), CAST(COUNT(DISTINCT text) AS BIGINT),
       CAST(MIN(length(text)) AS BIGINT), CAST(MAX(length(text)) AS BIGINT) FROM documents
ORDER BY col
""",
    doc=(
        "ANALYZE-style table profile of the documents corpus: per "
        "column, null count, EXACT distinct count, and min/max "
        "rendered length — the data-profiling pass a warehouse runs "
        "before planning (the stats behind CBO / skew decisions; "
        "approx_user_counts is the HLL scale path for the distinct "
        "column at 100 TB). ONE scan: all per-column aggregates in a "
        "single groupBy-less aggregation, stacked to long form by an "
        "explode of plan-constant structs (SURVEY §2.L)."
    ),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "n_chars", "source", "text"]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.length(s)).alias(f"{c}__minl"),
            F.max(F.length(s)).alias(f"{c}__maxl"),
        ]
    one = docs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__nulls").cast("bigint").alias("n_nulls"),
                F.col(f"{c}__nd").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__minl").cast("bigint").alias("min_len"),
                F.col(f"{c}__maxl").cast("bigint").alias("max_len"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.col", "r.n_nulls", "r.n_distinct", "r.min_len", "r.max_len")
        .orderBy("col")
    )


def _skew_sql(table: str, key: str) -> str:
    return f"""
SELECT '{table}.{key}' AS key_col,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(c) * 10000 // SUM(c) AS BIGINT) AS top1_bps,
       CAST(SUM(CASE WHEN rd <= 20 THEN c ELSE 0 END) * 10000 // SUM(c) AS BIGINT) AS top20_bps,
       CAST(SUM(c * (2 * ra - nk - 1)) * 10000 // (MAX(nk) * SUM(c)) AS BIGINT) AS gini_bps
FROM (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c ASC, k) AS ra,
         ROW_NUMBER() OVER (ORDER BY c DESC, k) AS rd,
         COUNT(*) OVER () AS nk
  FROM (SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY {key})
)
GROUP BY ALL
"""


@register(
    "join_skew_report",
    oracle=(
        _skew_sql("orders", "o_custkey")
        + " UNION ALL "
        + _skew_sql("lineitem", "l_orderkey")
        + " ORDER BY key_col"
    ),
    doc=(
        "Join-key skew diagnostic for the two fact join keys: key "
        "cardinality, top-1 and top-20 key volume shares, and the "
        "Gini concentration coefficient — the measurement that decides "
        "whether a key needs operators/skew.py salting or AQE skew "
        "handling BEFORE the join runs at 100 TB. Gini is computed "
        "entirely in integer arithmetic over the rank-ordered key "
        "counts (sum of c*(2i-n-1), exact-integer bps), so both "
        "engines agree bit-for-bit; the rank window runs over the "
        "key-cardinality count table, never fact rows (SURVEY §2.L)."
    ),
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    def skew(table: str, key: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        c = t.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
        wa = Window.orderBy(F.asc("c"), F.asc("k"))
        wd = Window.orderBy(F.desc("c"), F.asc("k"))
        r = c.select(
            "c",
            F.row_number().over(wa).alias("ra"),
            F.row_number().over(wd).alias("rd"),
            F.count("*").over(Window.partitionBy()).alias("nk"),
        )
        return r.agg(
            F.lit(f"{table}.{key}").alias("key_col"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.expr("max(c) * 10000L div sum(c)").cast("bigint").alias("top1_bps"),
            F.expr("sum(CASE WHEN rd <= 20 THEN c ELSE 0 END) * 10000L div sum(c)")
            .cast("bigint")
            .alias("top20_bps"),
            F.expr("sum(c * (2 * ra - nk - 1)) * 10000L div (max(nk) * sum(c))")
            .cast("bigint")
            .alias("gini_bps"),
        )

    return (
        skew("orders", "o_custkey")
        .unionAll(skew("lineitem", "l_orderkey"))
        .orderBy("key_col")
    )


@register(
    "ship_delay_profile",
    oracle="""
WITH d AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(delay_days) AS BIGINT) AS min_delay,
       CAST(MAX(delay_days) AS BIGINT) AS max_delay,
       CAST(SUM(delay_days) * 100 // COUNT(*) AS BIGINT) AS avg_delay_centidays,
       CAST(SUM(CASE WHEN delay_days > 60 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS late_bps
FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc=(
        "Order-to-ship delay profile per order priority (the SLA view "
        "behind q12's urgent-vs-normal split): integer day deltas from "
        "the orderkey join, mean as exact-integer centidays and "
        ">60-day late rate as exact-integer bps — no float anywhere. "
        "One fact-fact shuffle join on orderkey (co-located when both "
        "tables are bucketed by orderkey, sinks/parquet.py) + one "
        "map-side-combined rollup (SURVEY §2.G)."
    ),
)
def ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_days"),
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.min("delay_days").cast("bigint").alias("min_delay"),
            F.max("delay_days").cast("bigint").alias("max_delay"),
            F.expr("sum(delay_days) * 100L div count(*)")
            .cast("bigint")
            .alias("avg_delay_centidays"),
            F.expr("sum(CASE WHEN delay_days > 60 THEN 1 ELSE 0 END) * 10000L div count(*)")
            .cast("bigint")
            .alias("late_bps"),
        )
        .orderBy("o_orderpriority")
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (_CORR_COLS[i], _CORR_COLS[j])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
]


def _corr_oracle() -> str:
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(28,6)) * CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS ss_{c}"
        )
    for a, b in _CORR_PAIRS:
        sums.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(28,6)) * CAST({b} AS DECIMAL(28,6))) AS DOUBLE) AS sp_{a}_{b}"
        )
    rows = []
    for a, b in _CORR_PAIRS:
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"ROUND((n * sp_{a}_{b} - s_{a} * s_{b}) / "
            f"(SQRT(n * ss_{a} - s_{a} * s_{a}) * SQRT(n * ss_{b} - s_{b} * s_{b})), 6) AS pearson_r "
            f"FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY col_a, col_b"
    )


@register(
    "corr_matrix",
    oracle=_corr_oracle(),
    doc=(
        "Pairwise Pearson correlation matrix over the lineitem "
        "numeric columns (quantity, extendedprice, discount, tax) — "
        "the single-scan column-relationship profile a feature-"
        "engineering pass runs before model training (reference "
        "pattern-analytics axis, SURVEY §2.L). All sufficient "
        "statistics (sums, squares, cross-products) accumulate as "
        "exact DECIMAL in ONE map-side-combined aggregate over one "
        "scan — order-insensitive, so the distributed sums match the "
        "single-threaded oracle bit-for-bit; the 6 correlations are "
        "then closed-form arithmetic on that one 15-number row "
        "(identical double expression both engines). At 100 TB this "
        "is the optimal shape: no shuffle of fact rows at all, just "
        "partial aggregates of 15 decimals per partition."
    ),
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        d = F.col(c).cast("decimal(18,6)")
        aggs.append(F.sum(d).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(d * d).cast("double").alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        da = F.col(a).cast("decimal(18,6)")
        db = F.col(b).cast("decimal(18,6)")
        aggs.append(F.sum(da * db).cast("double").alias(f"sp_{a}_{b}"))
    s = li.agg(*aggs)
    pair_rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(
                (F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
                / (
                    F.sqrt(F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                    * F.sqrt(F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
                ),
                6,
            ).alias("pearson_r"),
        )
        for a, b in _CORR_PAIRS
    ]
    return (
        s.select(F.explode(F.array(*pair_rows)).alias("p"))
        .select("p.col_a", "p.col_b", "p.pearson_r")
        .orderBy("col_a", "col_b")
    )


# Benford expected first-digit frequencies in integer basis points:
# round(log10(1 + 1/d) * 10000) for d = 1..9, precomputed as literals
# so both engines compare against the same exact integers (no libm).
_BENFORD_BPS = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792, 6: 669, 7: 580, 8: 512, 9: 458}
_BENFORD_CASE = " ".join(f"WHEN d = {k} THEN {v}" for k, v in _BENFORD_BPS.items())


@register(
    "benford_fit",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders
),
c AS (
  SELECT d, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS total FROM d GROUP BY d
)
SELECT d AS digit,
       CAST(n AS BIGINT) AS n_orders,
       CAST(n * 10000 // total AS BIGINT) AS observed_bps,
       CAST(CASE {_BENFORD_CASE} END AS BIGINT) AS benford_bps,
       CAST(ABS(n * 10000 // total - CASE {_BENFORD_CASE} END) AS BIGINT) AS abs_dev_bps
FROM c ORDER BY digit
""",
    doc=(
        "Benford's-law first-digit audit of order totals — the "
        "classic anomaly/fraud screen a finance pipeline runs over "
        "monetary facts (reference audit axis, src/database.py "
        "get_audit_stats; SURVEY §2.L). Leading digit is extracted "
        "by exact integer/string steps (floor → bigint → first "
        "char), never log10, so there is no float edge at powers of "
        "ten; expected frequencies are precomputed integer-bps "
        "literals shared by both engines and deviations are exact "
        "integer arithmetic. One scan, 9-row output, map-side "
        "combined — scale-free."
    ),
)
def benford_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = orders.select(digit.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    c = c.withColumn("total", F.sum("n").over(Window.partitionBy()))
    bcase = F.expr(f"CASE {_BENFORD_CASE} END").cast("bigint")
    obs = F.expr("n * 10000L div total").cast("bigint")
    return c.select(
        F.col("d").alias("digit"),
        F.col("n").cast("bigint").alias("n_orders"),
        obs.alias("observed_bps"),
        bcase.alias("benford_bps"),
        F.abs(obs - bcase).cast("bigint").alias("abs_dev_bps"),
    ).orderBy("digit")


@register(
    "cube_status_priority",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    doc=(
        "Full CUBE over (status, priority) with count + exact-decimal "
        "revenue — the grouping-sets companion to rollup_source_lang "
        "covering every marginal at once (reference get_statistics "
        "dashboard axis, SURVEY §2.G). Spark expands the cube into "
        "grouping sets inside ONE partial/final hash aggregate (each "
        "input row feeds 4 cells map-side) — one scan, one shuffle of "
        "(status, priority, grouping-id) cells, never a re-scan per "
        "marginal. Decimal sums keep the distributed total "
        "order-insensitive."
    ),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@register(
    "revenue_mom",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS rev_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
l AS (
  SELECT month, rev_cents, n_orders,
         LAG(rev_cents) OVER (ORDER BY month) AS prev_cents
  FROM m
)
SELECT CAST(month AS DATE) AS month, rev_cents, n_orders,
       CAST(CASE WHEN prev_cents IS NULL THEN NULL
                 WHEN rev_cents >= prev_cents
                   THEN (rev_cents - prev_cents) * 10000 // prev_cents
                 ELSE -((prev_cents - rev_cents) * 10000 // prev_cents)
            END AS BIGINT) AS mom_bps
FROM l ORDER BY month
""",
    doc=(
        "Month-over-month revenue growth in exact integer basis "
        "points — the trend view of the reference's monthly rollups "
        "(get_email_patterns group_by=month; SURVEY §2.G). Revenue "
        "accumulates as exact integer cents (order-insensitive "
        "distributed sum); growth uses sign-split non-negative "
        "integer division so Spark `div` and DuckDB `//` agree on "
        "negative months. The lag window runs over the ~month-"
        "cardinality rollup (tiny), never fact rows; the one fact "
        "scan is map-side combined. Scale-free."
    ),
)
def revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("rev_cents"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    l = m.withColumn("prev_cents", F.lag("rev_cents").over(Window.orderBy("month")))
    mom = (
        F.when(F.col("prev_cents").isNull(), F.lit(None).cast("bigint"))
        .when(
            F.col("rev_cents") >= F.col("prev_cents"),
            F.expr("(rev_cents - prev_cents) * 10000L div prev_cents"),
        )
        .otherwise(-F.expr("(prev_cents - rev_cents) * 10000L div prev_cents"))
        .cast("bigint")
    )
    return l.select(
        F.col("month").cast("date").alias("month"),
        "rev_cents",
        "n_orders",
        mom.alias("mom_bps"),
    ).orderBy("month")


_PARETO_BUCKETS = 32


def _skyline_sweep(df: DataFrame, x: str, y: str, part_col: str | None) -> DataFrame:
    """One DESC range-frame sweep: keep rows not dominated within the
    (optional) partition — prev-max over strictly-greater x, peer-max
    over x ties. Exact for integer x."""
    base = (
        Window.partitionBy(part_col) if part_col is not None else Window.partitionBy()
    )
    w_prev = base.orderBy(F.desc(x)).rangeBetween(Window.unboundedPreceding, -1)
    w_peer = base.orderBy(F.desc(x)).rangeBetween(0, 0)
    return (
        df.withColumn("_pm", F.max(y).over(w_prev))
        .withColumn("_qm", F.max(y).over(w_peer))
        .where(
            (F.col("_pm").isNull() | (F.col(y) > F.col("_pm")))
            & (F.col(y) == F.col("_qm"))
        )
        .drop("_pm", "_qm")
    )


def two_pass_skyline(df: DataFrame, id_col: str, x: str, y: str) -> DataFrame:
    """Distributed 2D skyline (maximize x and y): bucket-local sweep
    prunes to ~O(log n) survivors per bucket, then a global sweep over
    survivors only — no single-partition sort of the full input.
    Property-tested against brute-force dominance in
    tests/test_properties.py."""
    local = _skyline_sweep(
        df.withColumn(
            "_b",
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
            .cast("int")
            % _PARETO_BUCKETS,
        ),
        x,
        y,
        "_b",
    ).drop("_b")
    return _skyline_sweep(local, x, y, None)



@register(
    "pareto_customers",
    oracle="""
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS spend_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT o_custkey, spend_cents, n_orders
FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders
    AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders)
)
ORDER BY spend_cents DESC, o_custkey
""",
    doc=(
        "Pareto frontier (skyline) of customers maximizing (total "
        "spend, order count) — the multi-criteria 'best customers' "
        "view a dominance query answers where top-k can't (SURVEY "
        "§2.L). Two-pass distributed sweep: bucket-local skyline "
        "first (hash-bucketed window: survivors per bucket ~O(log n) "
        "for random data), then the global sweep runs only over the "
        "bucket survivors — the full aggregate table never feeds a "
        "single-partition sort. Each sweep is one DESC range-frame "
        "window over exact integer cents (prev-max over strictly "
        "richer customers + peer-max over spend ties); the oracle "
        "cross-checks with an independent NOT-EXISTS dominance "
        "formulation."
    ),
)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("bigint")
        .alias("spend_cents"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    return two_pass_skyline(c, "o_custkey", "spend_cents", "n_orders").select(
        "o_custkey", "spend_cents", "n_orders"
    ).orderBy(F.desc("spend_cents"), "o_custkey")


@register(
    "segment_share_trend",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
         c.c_mktsegment AS segment,
         CAST(SUM(CAST(o.o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT month, segment, rev_cents,
         CAST(rev_cents * 10000 // SUM(rev_cents) OVER (PARTITION BY month) AS BIGINT) AS share_bps
  FROM m
)
SELECT month, segment, rev_cents, share_bps,
       CAST(share_bps - LAG(share_bps) OVER (PARTITION BY segment ORDER BY month) AS BIGINT) AS share_delta_bps
FROM s ORDER BY month, segment
""",
    doc=(
        "Monthly revenue share per market segment with month-over-"
        "month share drift — the mix-shift view behind q3's segment "
        "filter (is BUILDING growing or is the whole market?; SURVEY "
        "§2.G). One orders→customer join (customer broadcastable as "
        "the dimension side) feeding a map-side-combined month×segment "
        "rollup; the normalizing sum and the lag run over that "
        "~(months×5)-row table. Exact integer cents and bps "
        "throughout — no float shares."
    ),
)
def segment_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    m = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    wm = Window.partitionBy("month")
    s = m.withColumn(
        "share_bps",
        F.expr("rev_cents * 10000L div sum(rev_cents) over (partition by month)").cast(
            "bigint"
        ),
    )
    ws = Window.partitionBy("segment").orderBy("month")
    return s.select(
        "month",
        "segment",
        "rev_cents",
        "share_bps",
        (F.col("share_bps") - F.lag("share_bps").over(ws)).cast("bigint").alias("share_delta_bps"),
    ).orderBy("month", "segment")


@register(
    "supplier_hhi",
    oracle="""
WITH r AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_extendedprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS rev_cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
sh AS (
  SELECT nationkey, l_suppkey, rev_cents,
         CAST(rev_cents * 10000 // SUM(rev_cents) OVER (PARTITION BY nationkey) AS BIGINT) AS share_bps
  FROM r
)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(sh.rev_cents) AS BIGINT) AS rev_cents,
       CAST(MAX(sh.share_bps) AS BIGINT) AS top_share_bps,
       CAST(SUM(sh.share_bps * sh.share_bps) AS BIGINT) AS hhi
FROM sh JOIN nation n ON sh.nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY nation
""",
    doc=(
        "Herfindahl–Hirschman supplier-concentration index per "
        "nation: squared integer-bps revenue shares summed — the "
        "supply-risk view on top of q9/q15's per-supplier revenue "
        "(one dominant supplier → hhi near 10^8; atomized → near 0; "
        "SURVEY §2.G). One fact scan with a broadcastable supplier "
        "dimension join, partial-aggregated (nation, supplier) "
        "rollup; shares and HHI are pure integer arithmetic over the "
        "supplier-cardinality table (truncating div both engines — "
        "no float shares, no knife edges)."
    ),
)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    sh = r.withColumn(
        "share_bps",
        F.expr("rev_cents * 10000L div sum(rev_cents) over (partition by nationkey)").cast(
            "bigint"
        ),
    )
    return (
        sh.join(F.broadcast(nat), sh["nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("rev_cents").cast("bigint").alias("rev_cents"),
            F.max("share_bps").cast("bigint").alias("top_share_bps"),
            F.sum(F.col("share_bps") * F.col("share_bps")).cast("bigint").alias("hhi"),
        )
        .orderBy("nation")
    )


CHURN_TOP = 20


@register(
    "churn_risk",
    oracle=f"""
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         date_diff('day',
                   LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   CAST(o_orderdate AS DATE)) AS gap
  FROM orders
),
g AS (
  SELECT o_custkey, gap,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY gap, d) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS ng
  FROM o WHERE gap IS NOT NULL
),
med AS (
  SELECT o_custkey,
         MAX(CASE WHEN rn = (ng + 1) // 2 THEN gap END) AS med_gap,
         MAX(ng) AS n_gaps
  FROM g GROUP BY o_custkey
),
last_o AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d FROM orders GROUP BY o_custkey)
SELECT l.o_custkey,
       CAST(m.n_gaps + 1 AS BIGINT) AS n_orders,
       CAST(m.med_gap AS BIGINT) AS median_gap_days,
       CAST(date_diff('day', l.last_d, mx.mxd) AS BIGINT) AS days_silent,
       CAST(date_diff('day', l.last_d, mx.mxd) * 100 // m.med_gap AS BIGINT) AS silence_ratio_centi
FROM last_o l JOIN med m USING (o_custkey) CROSS JOIN mx
WHERE m.med_gap > 0 AND date_diff('day', l.last_d, mx.mxd) > 2 * m.med_gap
ORDER BY silence_ratio_centi DESC, o_custkey
LIMIT {CHURN_TOP}
""",
    doc=(
        "Churn-risk ranking: customers silent for more than twice "
        "their OWN median inter-order gap — the personalized-baseline "
        "alternative to a global inactivity cutoff (a weekly buyer "
        "gone 3 weeks outranks a quarterly buyer gone 2 months; "
        "SURVEY §2.G). Median gap is rank-SELECTED per customer "
        "(integer rank (n+1) div 2 over the lag-gap window — no "
        "interpolation), silence ratio is exact integer centi-units, "
        "and the per-customer windows ride ONE custkey-partitioned "
        "sort. Corpus max date broadcasts from a 1-row aggregate."
    ),
)
def churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    mx = orders.agg(F.max(d).alias("mxd"))
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = orders.select(
        "o_custkey",
        d.alias("d"),
        F.datediff(d, F.lag(d).over(wo)).alias("gap"),
    )
    g = o.where(F.col("gap").isNotNull()).select(
        "o_custkey",
        "gap",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("gap", "d"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("ng"),
    )
    med = g.groupBy("o_custkey").agg(
        F.max(F.when(F.col("rn") == F.expr("(ng + 1) div 2"), F.col("gap"))).alias("med_gap"),
        F.max("ng").alias("n_gaps"),
    )
    last_o = orders.groupBy("o_custkey").agg(F.max(d).alias("last_d"))
    j = last_o.join(med, "o_custkey").crossJoin(F.broadcast(mx))
    silent = F.datediff(F.col("mxd"), F.col("last_d"))
    return (
        j.where((F.col("med_gap") > 0) & (silent > 2 * F.col("med_gap")))
        .select(
            "o_custkey",
            (F.col("n_gaps") + 1).cast("bigint").alias("n_orders"),
            F.col("med_gap").cast("bigint").alias("median_gap_days"),
            silent.cast("bigint").alias("days_silent"),
            F.expr(
                "datediff(mxd, last_d) * 100L div med_gap"
            ).cast("bigint").alias("silence_ratio_centi"),
        )
        .orderBy(F.desc("silence_ratio_centi"), "o_custkey")
        .limit(CHURN_TOP)
    )


COPURCHASE_TOP = 25


@register(
    "copurchase_types",
    oracle=f"""
WITH ot AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS ptype
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sz AS (SELECT ptype, COUNT(*) AS n_orders FROM ot GROUP BY ptype),
tot AS (SELECT COUNT(DISTINCT okey) AS n_total FROM ot),
pairs AS (
  SELECT a.ptype AS type_a, b.ptype AS type_b, COUNT(*) AS n_both
  FROM ot a JOIN ot b ON a.okey = b.okey AND a.ptype < b.ptype
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       CAST(sa.n_orders AS BIGINT) AS n_a,
       CAST(sb.n_orders AS BIGINT) AS n_b,
       CAST(p.n_both * tot.n_total * 100 // (sa.n_orders * sb.n_orders) AS BIGINT) AS lift_centi
FROM pairs p
JOIN sz sa ON p.type_a = sa.ptype
JOIN sz sb ON p.type_b = sb.ptype
CROSS JOIN tot
ORDER BY n_both DESC, type_a, type_b
LIMIT {COPURCHASE_TOP}
""",
    doc=(
        "Market-basket affinity between part types: top co-occurring "
        "unordered type pairs within orders, with exact integer "
        "centi-lift (observed / expected-under-independence) — the "
        "co-purchase view behind recommendations and assortment "
        "planning (SURVEY §2.G). One distinct (order, type) "
        "projection; the self-join is keyed on orderkey so each "
        "order contributes only its own type-pair cross — bounded by "
        "types-per-order squared, never corpus squared; type "
        "marginals broadcast back over the pair table."
    ),
)
def copurchase_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    ot = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("ptype"))
        .distinct()
    )
    sz = ot.groupBy("ptype").agg(F.count("*").alias("n_orders"))
    tot = ot.agg(F.countDistinct("okey").alias("n_total"))
    a = ot.select("okey", F.col("ptype").alias("type_a"))
    b = ot.select("okey", F.col("ptype").alias("type_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = sz.select(F.col("ptype").alias("type_a"), F.col("n_orders").alias("n_a"))
    sb = sz.select(F.col("ptype").alias("type_b"), F.col("n_orders").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr("n_both * n_total * 100L div (n_a * n_b)").cast("bigint").alias("lift_centi"),
        )
        .orderBy(F.desc("n_both"), "type_a", "type_b")
        .limit(COPURCHASE_TOP)
    )


@register(
    "returns_by_delay",
    oracle="""
WITH d AS (
  SELECT CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
         LEAST(date_diff('day', o.o_orderdate, l.l_shipdate) // 15, 6) AS delay_bucket
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(delay_bucket AS BIGINT) AS delay_bucket,
       CAST(delay_bucket * 15 AS BIGINT) AS bucket_start_days,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(ret) AS BIGINT) AS n_returned,
       CAST(SUM(ret) * 10000 // COUNT(*) AS BIGINT) AS return_bps
FROM d GROUP BY delay_bucket ORDER BY delay_bucket
""",
    doc=(
        "Return rate by ship-delay bucket (15-day bins, capped) — "
        "does slow fulfilment drive returns? The operational "
        "diagnostic layered on q10's returned-item revenue and "
        "ship_delay_profile's SLA view (SURVEY §2.G). One "
        "orderkey-keyed fact-fact join (co-located under the bucketed "
        "layout), integer bucket arithmetic, map-side-combined "
        "exact-bps rollup over 7 cells."
    ),
)
def returns_by_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        F.least(
            F.expr("datediff(l_shipdate, o_orderdate) div 15"), F.lit(6)
        ).alias("delay_bucket"),
    )
    return (
        d.groupBy("delay_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("ret").cast("bigint").alias("n_returned"),
            F.expr("sum(ret) * 10000L div count(*)").cast("bigint").alias("return_bps"),
        )
        .select(
            F.col("delay_bucket").cast("bigint").alias("delay_bucket"),
            (F.col("delay_bucket") * 15).cast("bigint").alias("bucket_start_days"),
            "n_lines",
            "n_returned",
            "return_bps",
        )
        .orderBy("delay_bucket")
    )


@register(
    "revenue_concentration",
    oracle="""
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         SUM(cents) OVER () AS total,
         COUNT(*) OVER () AS n_cust
  FROM c
)
SELECT CAST(MAX(n_cust) AS BIGINT) AS n_customers,
       CAST(MAX(total) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rk <= 1 THEN cents ELSE 0 END) * 10000 // MAX(total) AS BIGINT) AS top1_bps,
       CAST(SUM(CASE WHEN rk <= 10 THEN cents ELSE 0 END) * 10000 // MAX(total) AS BIGINT) AS top10_bps,
       CAST(SUM(CASE WHEN rk <= 100 THEN cents ELSE 0 END) * 10000 // MAX(total) AS BIGINT) AS top100_bps,
       CAST(SUM(CASE WHEN 10 * rk <= n_cust THEN cents ELSE 0 END) * 10000 // MAX(total) AS BIGINT) AS top_decile_bps
FROM r
""",
    doc=(
        "Revenue concentration curve: share of total revenue held by "
        "the top-1/10/100 customers and the top decile, in exact "
        "integer bps — the whale-dependence read (pairs with "
        "join_skew_report: same skew, business lens; SURVEY §2.G). "
        "One fact rollup to customer cardinality, ONE rank window "
        "over that rollup serving every threshold via conditional "
        "sums — adding thresholds costs nothing."
    ),
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
        .cast("bigint")
        .alias("cents")
    )
    r = c.select(
        "cents",
        F.row_number().over(Window.orderBy(F.desc("cents"), "o_custkey")).alias("rk"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
        F.count("*").over(Window.partitionBy()).alias("n_cust"),
    )
    return r.agg(
        F.max("n_cust").cast("bigint").alias("n_customers"),
        F.max("total").cast("bigint").alias("total_cents"),
        F.expr("sum(CASE WHEN rk <= 1 THEN cents ELSE 0L END) * 10000L div max(total)")
        .cast("bigint")
        .alias("top1_bps"),
        F.expr("sum(CASE WHEN rk <= 10 THEN cents ELSE 0L END) * 10000L div max(total)")
        .cast("bigint")
        .alias("top10_bps"),
        F.expr("sum(CASE WHEN rk <= 100 THEN cents ELSE 0L END) * 10000L div max(total)")
        .cast("bigint")
        .alias("top100_bps"),
        F.expr("sum(CASE WHEN 10 * rk <= n_cust THEN cents ELSE 0L END) * 10000L div max(total)")
        .cast("bigint")
        .alias("top_decile_bps"),
    )


@register(
    "first_order_ltv",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(o_totalprice * 100 AS DECIMAL(18,0)) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
c AS (
  SELECT o_custkey,
         CAST(SUM(cents) AS BIGINT) AS ltv_cents,
         CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS first_cents,
         COUNT(*) AS n_orders
  FROM o GROUP BY o_custkey
),
q AS (
  SELECT ltv_cents, first_cents, n_orders,
         NTILE(4) OVER (ORDER BY first_cents, o_custkey) AS fq
  FROM c
)
SELECT CAST(fq AS BIGINT) AS first_order_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(first_cents) AS BIGINT) AS min_first_cents,
       CAST(MAX(first_cents) AS BIGINT) AS max_first_cents,
       CAST(SUM(ltv_cents) // COUNT(*) AS BIGINT) AS mean_ltv_cents,
       CAST(SUM(n_orders) * 100 // COUNT(*) AS BIGINT) AS mean_orders_centi
FROM q GROUP BY fq ORDER BY fq
""",
    doc=(
        "Does the first order predict lifetime value? Customers "
        "bucketed into quartiles of FIRST-order size (ntile over the "
        "customer rollup with a deterministic tiebreak), reporting "
        "mean total spend and order count per quartile in exact "
        "integer cents/centi-units — the acquisition-quality read "
        "behind rfm_segments (SURVEY §2.G). First order comes from "
        "the same custkey-partitioned sort the rollup needs; every "
        "mean is truncating integer division in both engines."
    ),
)
def first_order_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = orders.select(
        "o_custkey",
        (F.col("o_totalprice") * 100).cast("decimal(18,0)").alias("cents"),
        F.row_number().over(wo).alias("rn"),
    )
    c = o.groupBy("o_custkey").agg(
        F.sum("cents").cast("bigint").alias("ltv_cents"),
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).cast("bigint").alias("first_cents"),
        F.count("*").alias("n_orders"),
    )
    q = c.withColumn(
        "fq", F.ntile(4).over(Window.orderBy("first_cents", "o_custkey"))
    )
    return (
        q.groupBy("fq")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.min("first_cents").cast("bigint").alias("min_first_cents"),
            F.max("first_cents").cast("bigint").alias("max_first_cents"),
            F.expr("sum(ltv_cents) div count(*)").cast("bigint").alias("mean_ltv_cents"),
            F.expr("sum(n_orders) * 100L div count(*)").cast("bigint").alias("mean_orders_centi"),
        )
        .select(F.col("fq").cast("bigint").alias("first_order_quartile"), "n_customers", "min_first_cents", "max_first_cents", "mean_ltv_cents", "mean_orders_centi")
        .orderBy("first_order_quartile")
    )


VAR_TOP = 20


@register(
    "supplier_delay_variance",
    oracle=f"""
WITH d AS (
  SELECT l.l_suppkey,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
g AS (
  SELECT l_suppkey, COUNT(*) AS n, SUM(delay) AS sd, SUM(delay * delay) AS ssq
  FROM d GROUP BY l_suppkey HAVING COUNT(*) >= 10
)
SELECT s.s_name AS supplier,
       CAST(g.n AS BIGINT) AS n_lines,
       CAST(g.sd * 100 // g.n AS BIGINT) AS mean_delay_centi,
       CAST((g.n * g.ssq - g.sd * g.sd) * 100 // (g.n * g.n) AS BIGINT) AS var_delay_centi
FROM g JOIN supplier s ON g.l_suppkey = s.s_suppkey
ORDER BY var_delay_centi DESC, supplier
LIMIT {VAR_TOP}
""",
    doc=(
        "Least-consistent suppliers by ship-delay variance — "
        "predictability matters more than mean speed for promise "
        "dates (the ops ranking behind ship_delay_profile's rollup; "
        "SURVEY §2.G). Delay is an integer day delta, so mean and "
        "variance are EXACT integer centi-units via the "
        "emb_dim_variance closed form ((n·Σx² − (Σx)²) with "
        "truncating div in both engines) — no float path; one "
        "orderkey fact-fact join + supplier-cardinality rollup, "
        "min-support HAVING, TakeOrderedAndProject."
    ),
)
def supplier_delay_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    d = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay"),
    )
    g = (
        d.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("delay").alias("sd"),
            F.sum(F.col("delay") * F.col("delay")).alias("ssq"),
        )
        .where(F.col("n") >= 10)
    )
    return (
        g.join(F.broadcast(sup), g["l_suppkey"] == sup["s_suppkey"])
        .select(
            F.col("s_name").alias("supplier"),
            F.col("n").cast("bigint").alias("n_lines"),
            F.expr("sd * 100L div n").cast("bigint").alias("mean_delay_centi"),
            F.expr("(n * ssq - sd * sd) * 100L div (n * n)")
            .cast("bigint")
            .alias("var_delay_centi"),
        )
        .orderBy(F.desc("var_delay_centi"), "supplier")
        .limit(VAR_TOP)
    )


@register(
    "order_backlog_aging",
    oracle="""
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders),
o AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), mx.d) // 30 AS age_bucket,
         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS cents
  FROM orders, mx
  WHERE o_orderstatus <> 'F'
)
SELECT o_orderpriority AS priority,
       CAST(age_bucket AS BIGINT) AS age_bucket_30d,
       CAST(COUNT(*) AS BIGINT) AS n_open,
       CAST(SUM(cents) AS BIGINT) AS open_value_ten_thousandths
FROM o GROUP BY 1, 2 ORDER BY priority, age_bucket_30d
""",
    doc=(
        "Open-order backlog aging: non-finished orders ('O'/'P' "
        "status) bucketed by 30-day age bands relative to the "
        "corpus's own max order date, per priority, with exact "
        "DECIMAL open value — the receivables-aging view an "
        "operations dashboard runs next to pivot_status_priority's "
        "static crosstab (SURVEY §2.G). Integer day arithmetic with "
        "truncating div; money carried as exact integer "
        "ten-thousandths (order-insensitive sums); the max-date "
        "anchor is a 1-row broadcast; one pushed status filter + one "
        "map-side-combined rollup."
    ),
)
def order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d"))
    o = (
        orders.where(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(mx))
        .select(
            "o_orderpriority",
            F.expr("datediff(d, CAST(o_orderdate AS DATE)) div 30").alias("age_bucket"),
            (F.col("o_totalprice").cast("decimal(18,4)") * 10000).cast("bigint").alias("cents"),
        )
    )
    return (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("age_bucket").cast("bigint").alias("age_bucket_30d"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_open"),
            F.sum("cents").cast("bigint").alias("open_value_ten_thousandths"),
        )
        .orderBy("priority", "age_bucket_30d")
    )


@register(
    "segment_flow",
    oracle="""
WITH o AS (
  SELECT o_custkey AS custkey,
         CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS cents
  FROM orders
),
mid AS (SELECT MIN(d) + CAST((MAX(d) - MIN(d)) // 2 AS INTEGER) AS m FROM o),
s AS (
  SELECT custkey,
         CASE WHEN d <= mid.m THEN 0 ELSE 1 END AS half,
         SUM(cents) AS spend
  FROM o, mid GROUP BY 1, 2
),
q AS (
  SELECT custkey, half,
         NTILE(5) OVER (PARTITION BY half ORDER BY spend DESC, custkey) AS quintile
  FROM s
),
f AS (
  SELECT COALESCE(a.custkey, b.custkey) AS custkey,
         COALESCE(a.quintile, 0) AS q_first,
         COALESCE(b.quintile, 0) AS q_second
  FROM (SELECT custkey, quintile FROM q WHERE half = 0) a
  FULL OUTER JOIN (SELECT custkey, quintile FROM q WHERE half = 1) b
    ON a.custkey = b.custkey
)
SELECT CAST(q_first AS BIGINT) AS q_first,
       CAST(q_second AS BIGINT) AS q_second,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM f GROUP BY 1, 2 ORDER BY q_first, q_second
""",
    doc=(
        "Customer segment-migration matrix: spend quintile in the "
        "FIRST half of the order history vs the SECOND (date-midpoint "
        "split), quintile 0 = absent from that half — the flow view "
        "behind churn (Q1 -> 0), acquisition (0 -> Qx) and "
        "upgrade/downgrade diagonals that rfm_segments' static "
        "snapshot cannot show (SURVEY §2.G). Exact integer cents "
        "rollup per (customer, half); deterministic NTILE with "
        "custkey tiebreak (the rfm_segments convention) makes the "
        "quintile cuts engine-identical; one full-outer join on the "
        "customer key; 36-cell output at any scale."
    ),
)
def segment_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,4)") * 10000).cast("bigint").alias("cents"),
    )
    mid = o.agg(
        F.expr("CAST(min(d) + CAST(datediff(max(d), min(d)) div 2 AS INT) AS DATE)").alias("m")
    )
    s = (
        o.crossJoin(F.broadcast(mid))
        .select(
            "custkey",
            F.when(F.col("d") <= F.col("m"), 0).otherwise(1).alias("half"),
            "cents",
        )
        .groupBy("custkey", "half")
        .agg(F.sum("cents").alias("spend"))
    )
    w = Window.partitionBy("half").orderBy(F.desc("spend"), "custkey")
    q = s.select("custkey", "half", F.ntile(5).over(w).alias("quintile"))
    a = q.where(F.col("half") == 0).select("custkey", F.col("quintile").alias("qa"))
    b = q.where(F.col("half") == 1).select("custkey", F.col("quintile").alias("qb"))
    f = a.join(b, "custkey", "full_outer").select(
        F.coalesce(F.col("qa"), F.lit(0)).alias("q_first"),
        F.coalesce(F.col("qb"), F.lit(0)).alias("q_second"),
    )
    return (
        f.groupBy(
            F.col("q_first").cast("bigint").alias("q_first"),
            F.col("q_second").cast("bigint").alias("q_second"),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("q_first", "q_second")
    )


_RANGE_PARTS = 32


@register(
    "range_partition_plan",
    oracle=f"""
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) // 10000 AS coarse
  FROM orders
),
b AS (SELECT coarse, COUNT(*) AS n FROM o GROUP BY coarse),
nn AS (SELECT SUM(n) AS total FROM b),
c AS (
  SELECT coarse, n,
         SUM(n) OVER (ORDER BY coarse) AS cum,
         nn.total
  FROM b CROSS JOIN nn
),
a AS (
  SELECT coarse, n,
         (cum - 1) * {_RANGE_PARTS} // total AS pid
  FROM c
)
SELECT CAST(pid AS BIGINT) AS partition_id,
       CAST(MIN(coarse) AS BIGINT) AS lo_bucket,
       CAST(MAX(coarse) AS BIGINT) AS hi_bucket,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM a GROUP BY pid ORDER BY partition_id
""",
    doc=(
        f"Equi-depth range-partition plan for writing orders as a "
        f"{_RANGE_PARTS}-way range-partitioned warehouse table: "
        "dollar-granular value buckets, cumulative counts, and each "
        "bucket assigned to the partition its last row falls in "
        "((cum-1)*P div total — the shard_plan prefix-sum trick) — "
        "the write-side layout planner that sizes balanced range "
        "partitions WITHOUT a global row sort (SURVEY §2.G; the "
        "partitioner behind sinks/parquet.py layouts). Dollar "
        "granularity is the honest contract: partition boundaries "
        "need bucket resolution, not row resolution. One map-side-"
        "combined bucket rollup + one cumulative window over the "
        "bucket-cardinality table; pure integer arithmetic, "
        "bit-stable at any parallelism."
    ),
)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) div 10000"
        ).alias("coarse")
    )
    b = o.groupBy("coarse").agg(F.count("*").alias("n"))
    nn = b.agg(F.sum("n").alias("total"))
    w = Window.orderBy("coarse").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = b.crossJoin(F.broadcast(nn)).select(
        "coarse", "n", F.sum("n").over(w).alias("cum"), "total"
    )
    a = c.select(
        "coarse",
        "n",
        F.expr(f"(cum - 1) * {_RANGE_PARTS} div total").alias("pid"),
    )
    return (
        a.groupBy(F.col("pid").cast("bigint").alias("partition_id"))
        .agg(
            F.min("coarse").cast("bigint").alias("lo_bucket"),
            F.max("coarse").cast("bigint").alias("hi_bucket"),
            F.sum("n").cast("bigint").alias("n_rows"),
        )
        .orderBy("partition_id")
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter semi join — the distributed runtime-filter
# pattern (Spark's own runtime row-filtering, and the reference's
# selective-key lookups against indexed Postgres tables,
# src/database.py): build a compact bloom filter over the BUILD side's
# join keys, ship it to the probe as a 32 KB plan constant (bounded
# regardless of corpus size, unlike the keys themselves), pre-filter
# the probe side's scan, and only then run the exact semi join. At
# 100 TB the probe side sheds ~(1 - selectivity) of its rows BEFORE
# the join shuffle; the exact join after the filter removes bloom
# false positives, so the result is exactly the semi join.
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 4096  # 4096 x 64-bit words = 256 Kbit ≈ 32 KB filter
_BLOOM_K = 3  # hash probes per key


def _bloom_pos_sql(key: str, j: int) -> str:
    """Bit position of hash probe j for a key column — xxhash64
    seeded by the probe index via a leading literal lane."""
    return f"pmod(xxhash64({j}, {key}), {_BLOOM_WORDS * 64}L)"


def _bloom_build(keys: DataFrame, key_col: str):
    """Aggregate the build side's keys into a dense 64-bit-word bloom
    array and return it as a LITERAL array column. The collect is
    bounded at _BLOOM_WORDS rows (32 KB) no matter how many keys feed
    it — the same bounded-plan-constant convention as the kmeans
    codebook, and the same shape as Spark's injected runtime filters
    (bloom via scalar subquery). A literal predicate is evaluated on
    the probe SCAN and can never be join-reordered above it."""
    contribs = []
    for j in range(_BLOOM_K):
        pos = _bloom_pos_sql(key_col, j)
        contribs.append(
            F.struct(
                F.expr(f"{pos} div 64").alias("word"),
                F.expr(f"shiftleft(1L, CAST({pos} % 64 AS INT))").alias("m"),
            )
        )
    words = (
        keys.select(F.explode(F.array(*contribs)).alias("e"))
        .select("e.word", "e.m")
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("mask"))
        .collect()
    )
    dense = [0] * _BLOOM_WORDS
    for r in words:
        dense[r["word"]] = r["mask"]
    return F.expr("array(" + ",".join(f"{m}L" for m in dense) + ")")


def _bloom_hit(key_col: str, bloom_col: str):
    """AND of the K membership tests against the literal bloom array
    (1-indexed element_at)."""
    hit = None
    for j in range(_BLOOM_K):
        pos = _bloom_pos_sql(key_col, j)
        cond = F.expr(
            f"(shiftrightunsigned(element_at({bloom_col}, CAST({pos} div 64 AS INT) + 1), "
            f"CAST({pos} % 64 AS INT)) & 1L) = 1L"
        )
        hit = cond if hit is None else (hit & cond)
    return hit


@register(
    "bloom_semi_join",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
FROM lineitem
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    doc=(
        "Urgent-order lineitem revenue by return flag via a runtime "
        "bloom pre-filter: the urgent orderkeys build a 256 Kbit bloom "
        "filter (3 xxhash64 probes, per-word bit_or aggregate) that "
        "reaches the probe side as PLAN CONSTANTS — a bounded "
        f"{_BLOOM_WORDS}-long collect (32 KB regardless of the build "
        "side's cardinality, where collecting the keys themselves "
        "would not scale), exactly how Spark's own runtime row filter "
        "injects its bloom as a scalar-subquery result. As a literal "
        "scan-side predicate the bloom test CANNOT be reordered above "
        "the join (a broadcast-row formulation can — Catalyst join "
        "reordering put the semi join first), so non-matching lineitem "
        "rows drop BEFORE the join. The exact semi join then removes "
        "bloom false positives: the result is exactly the EXISTS "
        "semantics the oracle states; the bloom is pure plumbing and "
        "needs no oracle twin (SURVEY §2.G)."
    ),
)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    cand = li.withColumn("_bf", _bloom_build(urgent, "o_orderkey"))
    hit = _bloom_hit("l_orderkey", "_bf")
    disc_price = F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(6,4)")
    return (
        cand.where(hit)
        .drop("_bf")
        .join(urgent, F.col("l_orderkey") == urgent.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(F.sum(disc_price), 4).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton-curve) layout planner — the multi-dimensional
# clustering behind Delta/Iceberg OPTIMIZE ZORDER: interleave the bits
# of two dimension buckets so that files cover tight RECTANGLES in
# (customer, order-date) space and a predicate on EITHER dimension
# prunes most files; a 1-D range layout (range_partition_plan) can
# cluster only one of the two. Pure integer arithmetic (div/mod bit
# extraction), identical text in both engines.
# ---------------------------------------------------------------------------

_Z_BITS = 6  # 6 bits per dimension -> 4096 z-cells
_Z_FILES = 16  # z div 256 -> 16 target files


def _interleave_terms(bx: str, by: str, div: str) -> str:
    """Morton interleave as div/mod bit extraction — `div` is the
    engine's integer-division operator ('div' for Spark, '//' for
    DuckDB); everything else is shared text."""
    return " + ".join(
        f"(({bx} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + (({by} {div} {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(_Z_BITS)
    )


@register(
    "zorder_layout",
    oracle=f"""
WITH d AS (
  SELECT o_custkey AS ck, datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS dy
  FROM orders
),
mm AS (
  SELECT MIN(ck) AS ck_lo, MAX(ck) AS ck_hi, MIN(dy) AS dy_lo, MAX(dy) AS dy_hi FROM d
),
b AS (
  SELECT (ck - ck_lo) * {1 << _Z_BITS} // (ck_hi - ck_lo + 1) AS bx,
         (dy - dy_lo) * {1 << _Z_BITS} // (dy_hi - dy_lo + 1) AS by
  FROM d CROSS JOIN mm
),
z AS (SELECT bx, by, {_interleave_terms("bx", "by", "//")} AS zv FROM b)
SELECT CAST(zv // {(1 << (2 * _Z_BITS)) // _Z_FILES} AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(bx) AS BIGINT) AS cust_lo, CAST(MAX(bx) AS BIGINT) AS cust_hi,
       CAST(MIN(by) AS BIGINT) AS date_lo, CAST(MAX(by) AS BIGINT) AS date_hi
FROM z GROUP BY file_id ORDER BY file_id
""",
    doc=(
        f"Z-order (Morton-curve) layout plan for writing orders "
        f"clustered on (custkey, orderdate): equi-width {1 << _Z_BITS}-"
        "way buckets per dimension (min/max from a 1-row broadcast), "
        "bit-interleaved into a z-value, files = contiguous z-ranges. "
        "Each output row proves the property that makes OPTIMIZE "
        "ZORDER worth running at 100 TB: every file's (cust_lo..hi, "
        "date_lo..hi) rectangle is narrow in BOTH dimensions, so "
        "min/max file statistics prune on either predicate — a 1-D "
        "range sort clusters only one (SURVEY §2.G; "
        "range_partition_plan is the 1-D counterpart). Bit extraction "
        "is div/mod integer arithmetic shared textually with the "
        "oracle; one scan + one 1-row broadcast + one map-side-"
        "combined rollup."
    ),
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias("dy"),
    )
    mm = d.agg(
        F.min("ck").alias("ck_lo"),
        F.max("ck").alias("ck_hi"),
        F.min("dy").alias("dy_lo"),
        F.max("dy").alias("dy_hi"),
    )
    b = d.crossJoin(F.broadcast(mm)).select(
        F.expr(f"(ck - ck_lo) * {1 << _Z_BITS} div (ck_hi - ck_lo + 1)").alias("bx"),
        F.expr(f"(dy - dy_lo) * {1 << _Z_BITS} div (dy_hi - dy_lo + 1)").alias("by"),
    )
    z = b.select("bx", "by", F.expr(_interleave_terms("bx", "by", "div")).alias("zv"))
    return (
        z.groupBy(
            F.expr(f"zv div {(1 << (2 * _Z_BITS)) // _Z_FILES}").cast("bigint").alias("file_id")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("bx").cast("bigint").alias("cust_lo"),
            F.max("bx").cast("bigint").alias("cust_hi"),
            F.min("by").cast("bigint").alias("date_lo"),
            F.max("by").cast("bigint").alias("date_hi"),
        )
        .orderBy("file_id")
    )


@register(
    "nation_trade_balance",
    oracle="""
WITH d AS (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS rev
  FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
  GROUP BY 1, 2
)
SELECT LEAST(supp_nation, cust_nation) AS nation_a,
       GREATEST(supp_nation, cust_nation) AS nation_b,
       CAST(ROUND(SUM(rev), 4) AS DOUBLE) AS gross_revenue,
       CAST(ROUND(SUM(CASE WHEN supp_nation < cust_nation THEN rev ELSE -rev END), 4)
            AS DOUBLE) AS balance
FROM d GROUP BY 1, 2 ORDER BY nation_a, nation_b
""",
    doc=(
        "Bilateral trade-balance matrix: for every unordered nation "
        "pair, gross cross-border revenue and the NET balance "
        "(exports of the lexically-smaller nation minus its imports) "
        "— the anti-symmetrized view of q7's directed volume matrix, "
        "answering 'who runs a surplus against whom'. Same scale "
        "shape as q7 (all dims broadcast, lineitem-orders is the "
        "only big shuffle, DECIMAL-exact sums); the "
        "anti-symmetrization is ONE signed aggregate over the tiny "
        "directed rollup — no second fact pass, no self-join "
        "(SURVEY §2.G)."
    ),
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from email_etl_spark.plans.relational import _disc_price

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    signed = F.when(
        F.col("supp_nation") < F.col("cust_nation"), F.col("rev")
    ).otherwise(-F.col("rev"))
    return (
        d.groupBy(
            F.least("supp_nation", "cust_nation").alias("nation_a"),
            F.greatest("supp_nation", "cust_nation").alias("nation_b"),
        )
        .agg(
            F.round(F.sum("rev"), 4).cast("double").alias("gross_revenue"),
            F.round(F.sum(signed), 4).cast("double").alias("balance"),
        )
        .orderBy("nation_a", "nation_b")
    )


@register(
    "pareto_skyline",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_size, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_centi
  FROM part
),
szmin AS (SELECT p_size, MIN(price_centi) AS minp FROM p GROUP BY p_size),
lg AS (
  SELECT p_size, minp,
         MIN(minp) OVER (ORDER BY p_size DESC ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS minp_larger
  FROM szmin
)
SELECT p.p_partkey, p.p_size, p.price_centi
FROM p JOIN lg USING (p_size)
WHERE (lg.minp_larger IS NULL OR p.price_centi < lg.minp_larger)
  AND p.price_centi = lg.minp
ORDER BY p.p_size DESC, p.price_centi, p.p_partkey
""",
    doc=(
        "Pareto skyline of the part catalog (maximize size, minimize "
        "price): parts no other part dominates — the classic skyline "
        "operator, the 'best tradeoffs' shortlist behind procurement "
        "and plan-choice UIs. Dominance collapses to TWO-LEVEL "
        "integer arithmetic: per-size min price (shuffles only the "
        "~50 distinct sizes), a strictly-larger-size running min over "
        "that tiny table, and a broadcast join back — a part survives "
        "iff it hits its size's min price and beats every larger "
        "size's best; no global sort over parts, no quadratic "
        "dominance join, centi-unit exact. Equal-objective parts all "
        "survive (standard skyline tie semantics) (SURVEY §2.G)."
    ),
)
def pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_centi"),
    )
    szmin = p.groupBy("p_size").agg(F.min("price_centi").alias("minp"))
    wl = Window.orderBy(F.desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    lg = szmin.select("p_size", "minp", F.min("minp").over(wl).alias("minp_larger"))
    return (
        p.join(F.broadcast(lg), "p_size")
        .where(
            (F.col("minp_larger").isNull() | (F.col("price_centi") < F.col("minp_larger")))
            & (F.col("price_centi") == F.col("minp"))
        )
        .select("p_partkey", "p_size", "price_centi")
        .orderBy(F.desc("p_size"), "price_centi", "p_partkey")
    )


@register(
    "hll_rollup",
    oracle=_sketch_fact_oracle("hll_rollup", {}, "week"),
    doc=(
        "Mergeable-sketch rollup: build ONE Datasketches HLL sketch of "
        "user_id per day, then derive weekly and monthly uniques by "
        "UNIONING the day sketches — the fact stream is scanned "
        "exactly once, and every coarser grain is an O(#days) merge "
        "of kilobyte sketch states. This is THE 100 TB pattern for "
        "distinct-count dashboards (a pre-aggregated sketch table "
        "answers any date-range question without touching events "
        "again; exact COUNT(DISTINCT) cannot merge). Output: one row "
        "per ISO week plus a 'total' row, estimates from "
        "hll_union_agg / hll_sketch_estimate. HLL registers are "
        "max-of-hash (commutative, associative, idempotent), so the "
        "estimates are corpus-pure facts: oracle-checked against the "
        "generated fact table (_sketch_expected.py); the accuracy "
        "bound vs the exact aggregate stays pinned by a property test "
        "(SURVEY §2.L)."
    ),
)
def hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # grain table: one compact sketch per day — at 100 TB this is the
    # table a sink would persist (sketches survive storage round-trips)
    day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    week = day.groupBy(F.weekofyear("day").cast("bigint").alias("week")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    total = day.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_days"),
    ).select(F.lit(-1).cast("bigint").alias("week"), "est_users", "n_events", "n_days")
    return week.unionByName(total).orderBy("week")


def _join_size_sql(name: str, ta: str, ka: str, tb: str, kb: str) -> str:
    # n_left/n_right carry the SAME null-key filter as the Spark plan
    # (which derives them from the isNotNull-filtered key-count tables
    # so AQE can ReusedExchange): identical on TPC-H's non-null keys,
    # but required for bit-exact parity on any dataset with NULL join
    # keys (null keys never match an equi-join anyway).
    return f"""
SELECT '{name}' AS join_name,
       (SELECT COUNT(*) FROM {ta} WHERE {ka} IS NOT NULL) AS n_left,
       (SELECT COUNT(*) FROM {tb} WHERE {kb} IS NOT NULL) AS n_right,
       CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS join_rows,
       CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT) AS max_key_rows,
       CAST(COUNT(*) AS BIGINT) AS n_matching_keys
FROM (SELECT {ka} AS k, COUNT(*) AS ca FROM {ta} WHERE {ka} IS NOT NULL GROUP BY 1) a
JOIN (SELECT {kb} AS k, COUNT(*) AS cb FROM {tb} WHERE {kb} IS NOT NULL GROUP BY 1) b USING (k)
"""


_JOIN_SIZE_SPECS = (
    ("customer*orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders*lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part*lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
)


@register(
    "join_size_estimate",
    oracle="\nUNION ALL\n".join(_join_size_sql(*s) for s in _JOIN_SIZE_SPECS)
    + "\nORDER BY join_name",
    doc=(
        "Join-cardinality profiler: the EXACT output size of each "
        "equi-join, computed WITHOUT running the join — "
        "|A JOIN B| = sum over keys of cnt_A(k)*cnt_B(k), plus the "
        "hottest key's contribution (the skew canary). This is the "
        "pre-flight check before any 100 TB fact-fact join: the two "
        "key-count tables it aggregates are orders of magnitude "
        "smaller than the join output they predict, so the answer "
        "costs two map-side-combined aggs + one count-table join "
        "instead of the full shuffle-and-materialize. max_key_rows "
        ">> join_rows/n_matching_keys means salt before you join "
        "(operators/skew.py) (SURVEY §2.G)."
    ),
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str, ta: str, ka: str, tb: str, kb: str) -> DataFrame:
        # n_left/n_right fold out of the same key-count tables the
        # estimator joins. The explicit isNotNull matches the filter
        # the join pushes into ITS branch — without it the two
        # consumers scan/shuffle different subtrees and Spark cannot
        # ReusedExchange them (null keys never match a join anyway).
        a = (
            load_table(spark, sf_dir, ta)
            .where(F.col(ka).isNotNull())
            .groupBy(F.col(ka).alias("k"))
            .agg(F.count("*").alias("ca"))
        )
        b = (
            load_table(spark, sf_dir, tb)
            .where(F.col(kb).isNotNull())
            .groupBy(F.col(kb).alias("k"))
            .agg(F.count("*").alias("cb"))
        )
        na = a.agg(F.sum("ca").cast("bigint").alias("n_left"))
        nb = b.agg(F.sum("cb").cast("bigint").alias("n_right"))
        prod = (F.col("ca") * F.col("cb")).alias("prod")
        return (
            a.join(b, "k")
            .select(prod)
            .agg(
                F.coalesce(F.sum("prod"), F.lit(0)).cast("bigint").alias("join_rows"),
                F.coalesce(F.max("prod"), F.lit(0)).cast("bigint").alias("max_key_rows"),
                F.count("*").cast("bigint").alias("n_matching_keys"),
            )
            .crossJoin(F.broadcast(na))
            .crossJoin(F.broadcast(nb))
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "join_rows",
                "max_key_rows",
                "n_matching_keys",
            )
        )

    out = None
    for spec in _JOIN_SIZE_SPECS:
        part = one(*spec)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("join_name")


@register(
    "grouping_sets_revenue",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS grouping_id,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_centi
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY grouping_id, priority, status
""",
    doc=(
        "Arbitrary GROUPING SETS report — the per-priority and "
        "per-status marginals plus the grand total in ONE pass, "
        "WITHOUT the full cross-product cube_status_priority pays "
        "(a cube over k columns expands 2^k groupings; a dashboard "
        "usually wants a handful). grouping_id disambiguates which "
        "marginal a row belongs to — COALESCE('ALL') alone cannot "
        "distinguish a real 'ALL' value. Spark expands grouping sets "
        "into one Expand + single aggregate exchange; revenue stays "
        "exact integer centi-units (SURVEY §2.G)."
    ),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    gid = F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            gid.cast("bigint").alias("grouping_id"),
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev_centi"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "grouping_id",
            "n_orders",
            "rev_centi",
        )
        .orderBy("grouping_id", "priority", "status")
    )


MG_K = 32  # counters per partition summary
MG_PARTS = 8  # deterministic partition count for the summary pass


@register(
    "heavy_hitters_mg",
    oracle=_sketch_fact_oracle("heavy_hitters_mg", {}, "est_count DESC, user_id"),
    doc=(
        "Misra-Gries heavy hitters over user activity — the THIRD "
        "mergeable summary in the sketch family (HLL distincts, "
        "t-digest quantiles, MG frequencies): each partition keeps at "
        "most K=32 counters (eviction decrements all — the classic "
        "one-pass algorithm), summaries merge by summing and the "
        "standard (K+1)-th-largest subtraction restores the merged "
        "bound, so any user with true count > N/(K+1) MUST survive "
        "and every estimate undercounts by at most N/(K+1). At 100 TB "
        "this replaces a full groupBy when only the top talkers "
        "matter: the shuffle carries <= K rows per partition instead "
        "of one per key. Determinism: rows hash-repartition on "
        "event_id and sort within partitions, so the per-partition "
        "scan order (which MG's contents depend on) is pinned at any "
        "parallelism (SURVEY §2.L)."
    ),
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    pinned = ev.repartition(MG_PARTS, "event_id").sortWithinPartitions("event_id")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def mg(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            for u in pdf["user_id"]:
                u = int(u)
                if u in counters:
                    counters[u] += 1
                elif len(counters) < MG_K:
                    counters[u] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for d in dead:
                        del counters[d]
        yield pd.DataFrame(
            {"user_id": list(counters), "cnt": list(counters.values())}
        ).astype("int64", errors="ignore")

    summaries = pinned.mapInPandas(mg, schema=schema)
    merged = summaries.groupBy("user_id").agg(F.sum("cnt").alias("cnt"))
    # merged-summary reduction: subtract the (K+1)-th largest counter
    # (0 when fewer survive) and keep positive — restores the N/(K+1)
    # undercount guarantee after the merge (Agarwal et al. 2012)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), "user_id")
    ranked = merged.select("user_id", "cnt", F.row_number().over(w).alias("rk"))
    thresh = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == MG_K + 1, F.col("cnt"))), F.lit(0)
        ).alias("sub")
    )
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .select(
            "user_id",
            (F.col("cnt") - F.col("sub")).cast("bigint").alias("est_count"),
        )
        .where(F.col("est_count") > 0)
        .orderBy(F.desc("est_count"), "user_id")
    )


@register(
    "revenue_bridge",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
l AS (
  SELECT month, n, rev,
         LAG(n) OVER (ORDER BY month) AS n_p,
         LAG(rev) OVER (ORDER BY month) AS rev_p
  FROM m
)
SELECT CAST(month AS DATE) AS month,
       CAST(n AS BIGINT) AS n_orders,
       CAST(rev AS BIGINT) AS rev_centi,
       CAST(rev - rev_p AS BIGINT) AS d_rev_centi,
       (CAST(n AS DOUBLE) - n_p) * (CAST(rev_p AS DOUBLE) / n_p) / 100
         AS volume_effect,
       (CAST(rev AS DOUBLE) / n - CAST(rev_p AS DOUBLE) / n_p)
             * CAST(n AS DOUBLE) / 100 AS price_effect
FROM l WHERE n_p IS NOT NULL AND month >= DATE '1998-01-01'
ORDER BY month
""",
    doc=(
        "Month-over-month revenue BRIDGE (the FP&A waterfall): "
        "decompose each month's revenue delta into a volume effect "
        "(order-count change at last month's average order value) and "
        "a price/mix effect (AOV change at this month's volume) — "
        "volume + price = delta exactly in real arithmetic, the "
        "standard two-factor decomposition behind every 'why did "
        "revenue move' review (the explanatory layer on top of "
        "revenue_mom's raw deltas). Shape: ONE map-side-combined "
        "monthly rollup is the only pass over orders; the lag window "
        "runs on the calendar-bounded month table. Deltas stay exact "
        "integer centi-units; the two effects are identical "
        "structurally-ordered double expressions in both engines, "
        "shipped UNROUNDED (bit-equal by construction; an output ROUND hit the decimal-string-vs-binary halfway split) (SURVEY §2.G)."
    ),
)
def revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"),
    )
    w = Window.orderBy("month")
    l = m.select(
        "month",
        "n",
        "rev",
        F.lag("n").over(w).alias("n_p"),
        F.lag("rev").over(w).alias("rev_p"),
    )
    # UNROUNDED on purpose: both engines evaluate the identical
    # structurally-ordered expression over identical exact integers,
    # so the IEEE doubles are bit-equal — ROUND(...,2) reintroduced
    # the decimal-string-vs-binary halfway split at sf0.001
    vol = (
        (F.col("n").cast("double") - F.col("n_p"))
        * (F.col("rev_p").cast("double") / F.col("n_p"))
        / 100
    )
    price = (
        (F.col("rev").cast("double") / F.col("n") - F.col("rev_p").cast("double") / F.col("n_p"))
        * F.col("n").cast("double")
        / 100
    )
    return (
        l.where(F.col("n_p").isNotNull() & (F.col("month") >= F.lit("1998-01-01").cast("date")))
        .select(
            F.col("month").cast("date").alias("month"),
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("rev").cast("bigint").alias("rev_centi"),
            (F.col("rev") - F.col("rev_p")).cast("bigint").alias("d_rev_centi"),
            vol.alias("volume_effect"),
            price.alias("price_effect"),
        )
        .orderBy("month")
    )


NDR_COHORT_BEFORE = "1996-01-01"
NDR_MAX_K = 11


@register(
    "cohort_dollar_retention",
    oracle=f"""
WITH f AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY 1
),
r AS (
  SELECT f.cohort,
         (EXTRACT(year FROM o.o_orderdate) - EXTRACT(year FROM f.cohort)) * 12
         + (EXTRACT(month FROM o.o_orderdate) - EXTRACT(month FROM f.cohort)) AS k,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev,
         COUNT(DISTINCT o.o_custkey) AS n_active
  FROM orders o JOIN f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
base AS (SELECT cohort, rev AS rev0 FROM r WHERE k = 0)
SELECT CAST(r.cohort AS DATE) AS cohort, CAST(r.k AS BIGINT) AS k,
       CAST(r.n_active AS BIGINT) AS n_active,
       CAST(r.rev AS BIGINT) AS rev_centi,
       CAST(r.rev * 10000 // b.rev0 AS BIGINT) AS ndr_bps
FROM r JOIN base b USING (cohort)
WHERE r.cohort < DATE '{NDR_COHORT_BEFORE}' AND r.k <= {NDR_MAX_K}
ORDER BY cohort, k
""",
    doc=(
        "Dollar retention matrix (NDR) by first-order cohort: each "
        "1995 cohort's month-k revenue as exact integer bps of its "
        "month-0 revenue — the REVENUE twin of retention_cohorts' "
        "user counts, and the metric subscription/marketplace finance "
        "actually reviews (users can be retained while dollars "
        "churn). Shape: one first-order aggregate (shuffles customer "
        "keys once), one key-equality join back to the fact stream, "
        "one (cohort, k) rollup — month arithmetic is pure integer "
        "(year*12+month), the month-0 base joins back on the tiny "
        "cohort table, and every ratio is an exact integer div "
        "(SURVEY §2.G)."
    ),
)
def cohort_dollar_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    o = orders.join(f, "o_custkey")
    k = (F.year("o_orderdate") - F.year("cohort")) * 12 + (
        F.month("o_orderdate") - F.month("cohort")
    )
    r = o.groupBy("cohort", k.alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev"),
        F.countDistinct("o_custkey").alias("n_active"),
    )
    base = r.where(F.col("k") == 0).select("cohort", F.col("rev").alias("rev0"))
    return (
        r.join(F.broadcast(base), "cohort")
        .where(
            (F.col("cohort") < F.lit(NDR_COHORT_BEFORE).cast("timestamp"))
            & (F.col("k") <= NDR_MAX_K)
        )
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            F.col("k").cast("bigint").alias("k"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("rev").cast("bigint").alias("rev_centi"),
            F.expr("rev * 10000 div rev0").cast("bigint").alias("ndr_bps"),
        )
        .orderBy("cohort", "k")
    )


@register(
    "gini_revenue",
    oracle="""
WITH c AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
r AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i FROM c),
s AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(rev AS DECIMAL(38,0))) AS sx,
         SUM(CAST(i AS DECIMAL(38,0)) * rev) AS six
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(sx AS BIGINT) AS total_rev_centi,
       (2.0 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
FROM s
""",
    doc=(
        "Gini coefficient of customer revenue — the inequality "
        "SUMMARY that completes the concentration family "
        "(revenue_concentration's top-k shares and supplier_hhi "
        "answer 'who dominates'; Gini answers 'how unequal overall', "
        "comparable across periods and segments). Exact rank formula "
        "G = (2*Σ i*x_(i) − (n+1)*Σ x) / (n*Σ x) over the ascending "
        "revenue order: moments are DECIMAL(38,0) integer sums (rank "
        "× centi-revenue products overflow BIGINT at scale), the "
        "final expression one identical double fold — unrounded, "
        "bit-equal. Shape: per-customer rollup (the only pass over "
        "orders), ONE rank window over the customer-cardinality "
        "table, one 1-row moment aggregate (SURVEY §2.G)."
    ),
)
def gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    r = c.select("rev", F.row_number().over(w).alias("i"))
    s = r.agg(
        F.count("*").alias("n"),
        F.sum(F.col("rev").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev")).alias("six"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("sx").cast("bigint").alias("total_rev_centi"),
        (
            (2.0 * F.col("six").cast("double") - (F.col("n").cast("double") + 1) * F.col("sx").cast("double"))
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
        ).alias("gini"),
    )


@register(
    "category_tree_shares",
    oracle="""
WITH f AS (
  SELECT p.p_brand AS brand, p.p_type AS type,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
           AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT brand, type,
       CAST(rev AS BIGINT) AS rev_centi,
       CAST(rev * 10000 // SUM(rev) OVER (PARTITION BY brand) AS BIGINT)
         AS share_of_brand_bps,
       CAST(SUM(rev) OVER (PARTITION BY brand) * 10000 // SUM(rev) OVER ()
            AS BIGINT) AS brand_share_bps
FROM f ORDER BY brand, type
""",
    doc=(
        "Percent-of-parent category tree (total -> brand -> type): "
        "each leaf's share of its brand and each brand's share of "
        "total revenue, in exact integer bps — the drill-down tree "
        "every BI category view renders, and the windowed "
        "percent-of-parent shape rollup/cube don't give you (they "
        "produce the LEVELS; this produces the RATIOS between "
        "adjacent levels). Shape: one fact-dim key join + one "
        "(brand, type) map-side-combined rollup over lineitem — the "
        "only fact pass; both share windows then run over the "
        "category-cardinality table (brand window partitions it, the "
        "global-sum window is O(|categories|)). Exact integer div "
        "everywhere (SURVEY §2.G)."
    ),
)
def category_tree_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    f = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("type"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            ).alias("rev")
        )
    )
    wb = Window.partitionBy("brand")
    wall = Window.partitionBy()
    return (
        f.select(
            "brand",
            "type",
            F.col("rev").cast("bigint").alias("rev_centi"),
            F.sum("rev").over(wb).alias("_brand_rev"),
            F.sum("rev").over(wall).alias("_total_rev"),
        )
        .select(
            "brand",
            "type",
            "rev_centi",
            F.expr("rev_centi * 10000 div _brand_rev")
            .cast("bigint")
            .alias("share_of_brand_bps"),
            F.expr("_brand_rev * 10000 div _total_rev")
            .cast("bigint")
            .alias("brand_share_bps"),
        )
        .orderBy("brand", "type")
    )


# ---------------------------------------------------------------------------
# bloom_fpr_report — measured vs theoretical false-positive rate of the
# engine's bloom pre-filter geometry (bloom_semi_join's companion).
# The production filter hashes with xxhash64 (JVM-fast); the REPORT
# uses the engine's md5-derived lanes so the bit pattern itself is
# reproducible in any oracle — geometry (m, k) and the fill/FPR math
# are identical either way.
# ---------------------------------------------------------------------------

_BF_M = 262144  # 256 Kbit, the bloom_semi_join geometry
_BF_K = 3


def _bf_pos_spark(j: int, key: str) -> str:
    return (
        f"CAST(CONV(SUBSTRING(MD5(CONCAT('bf{j}:', CAST({key} AS STRING))), 1, 6), 16, 10) "
        f"AS BIGINT) % {_BF_M}"
    )


def _bf_pos_duck(j: int, key: str) -> str:
    digit = (
        lambda i: f"(strpos('0123456789abcdef', substr(md5('bf{j}:' || CAST({key} AS VARCHAR)), {i}, 1)) - 1)"
    )
    poly = " + ".join(f"{digit(i)} * {16 ** (6 - i)}" for i in range(1, 7))
    return f"(({poly}) % {_BF_M})"


_BF_THEORY = (
    f"CAST(ROUND(POWER(1.0 - POWER(1.0 - 1.0 / {_BF_M}, {_BF_K} * n_build), {_BF_K}) "
    "* 10000) AS BIGINT)"
)


def _bloom_fpr_oracle() -> str:
    build_pos = " UNION ALL ".join(
        f"SELECT {_bf_pos_duck(j, 'c_custkey')} AS pos FROM build" for j in range(_BF_K)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT c_custkey AS k, {_bf_pos_duck(j, 'c_custkey')} AS pos FROM probe"
        for j in range(_BF_K)
    )
    return f"""
WITH build AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
probe AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 1),
bpos AS (SELECT DISTINCT pos FROM ({build_pos})),
ppos AS ({probe_pos}),
hits AS (
  SELECT p.k, SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM ppos p LEFT JOIN bpos b ON p.pos = b.pos
  GROUP BY p.k
),
agg AS (
  SELECT (SELECT COUNT(*) FROM build) AS n_build,
         (SELECT COUNT(*) FROM probe) AS n_probe,
         (SELECT COUNT(*) FROM bpos) AS n_bits_set,
         (SELECT COUNT(*) FROM hits WHERE n_hit = {_BF_K}) AS fp_count
)
SELECT CAST(n_build AS BIGINT) AS n_build,
       CAST(n_probe AS BIGINT) AS n_probe,
       CAST({_BF_M} AS BIGINT) AS m_bits,
       CAST({_BF_K} AS BIGINT) AS k_hashes,
       CAST(n_bits_set AS BIGINT) AS n_bits_set,
       CAST(n_bits_set * 10000 // {_BF_M} AS BIGINT) AS fill_bps,
       CAST(fp_count AS BIGINT) AS fp_count,
       CAST(fp_count * 10000 // n_probe AS BIGINT) AS fpr_bps,
       {_BF_THEORY} AS fpr_theory_bps
FROM agg
"""


@register(
    "bloom_fpr_report",
    oracle=_bloom_fpr_oracle(),
    doc=(
        "Bloom-filter quality report for the 256 Kbit / k=3 geometry "
        "bloom_semi_join ships: build the bit pattern from the even "
        "customer keys, probe with the odd keys (guaranteed "
        "negatives), and report bits set, fill ratio, MEASURED "
        "false-positive rate, and the textbook expectation "
        "(1-(1-1/m)^(kn))^k — the sizing check before trusting a "
        "bloom to shed probe traffic at a bigger build cardinality. "
        "Position set is md5-derived (engine convention) so the exact "
        "bit pattern is oracle-reproducible; all joins key on bit "
        "POSITIONS (bounded by m = 262144, never corpus-sized), "
        "counts are exact integers, the only double is the final "
        "rounded theory term (SURVEY §2.G)."
    ),
)
def bloom_fpr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    build = cust.where(F.col("c_custkey") % 2 == 0).select("c_custkey")
    probe = cust.where(F.col("c_custkey") % 2 == 1).select("c_custkey")
    bpos = (
        build.select(
            F.explode(
                F.array(*[F.expr(_bf_pos_spark(j, "c_custkey")) for j in range(_BF_K)])
            ).alias("pos")
        )
        .distinct()
    )
    ppos = probe.select(
        F.col("c_custkey").alias("k"),
        F.explode(
            F.array(*[F.expr(_bf_pos_spark(j, "c_custkey")) for j in range(_BF_K)])
        ).alias("pos"),
    )
    hits = (
        ppos.join(bpos.withColumn("present", F.lit(1)), "pos", "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("present"), F.lit(0))).alias("n_hit"))
    )
    agg = (
        build.agg(F.count("*").alias("n_build"))
        .crossJoin(F.broadcast(probe.agg(F.count("*").alias("n_probe"))))
        .crossJoin(F.broadcast(bpos.agg(F.count("*").alias("n_bits_set"))))
        .crossJoin(
            F.broadcast(
                hits.where(F.col("n_hit") == _BF_K).agg(
                    F.count("*").alias("fp_count")
                )
            )
        )
    )
    return agg.select(
        F.col("n_build").cast("bigint").alias("n_build"),
        F.col("n_probe").cast("bigint").alias("n_probe"),
        F.lit(_BF_M).cast("bigint").alias("m_bits"),
        F.lit(_BF_K).cast("bigint").alias("k_hashes"),
        F.col("n_bits_set").cast("bigint").alias("n_bits_set"),
        F.expr(f"n_bits_set * 10000 div {_BF_M}").cast("bigint").alias("fill_bps"),
        F.col("fp_count").cast("bigint").alias("fp_count"),
        F.expr("fp_count * 10000 div n_probe").cast("bigint").alias("fpr_bps"),
        F.expr(_BF_THEORY).alias("fpr_theory_bps"),
    )


# ---------------------------------------------------------------------------
# returns_odds_ratio — 2x2 odds ratio: high-discount exposure vs returns.
# ---------------------------------------------------------------------------


@register(
    "returns_odds_ratio",
    oracle="""
WITH s AS (
  SELECT CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lineitem
)
SELECT a AS n_exposed_returned, b AS n_exposed_kept,
       c AS n_unexposed_returned, d AS n_unexposed_kept,
       ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 4) AS odds_ratio,
       ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 - 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) AS ci95_low,
       ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                 + 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4) AS ci95_high,
       (ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
        - 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)) > 0
       OR (ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
           + 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)) < 0 AS significant_95
FROM s
""",
    doc=(
        "2x2 odds ratio with the Woolf logit 95% CI: are high-discount "
        "line items (>= 5%) more likely to come back as returns "
        "(l_returnflag = 'R')? The case-control-style effect measure "
        "behind promotion-abuse and margin-leak questions — "
        "q10_returned_items ranks who returns, this says whether the "
        "discount lever CAUSES it (associationally). Four exact "
        "integer cells off ONE conditional-aggregate scan; OR, the "
        "log-scale CI bounds, and the significance flag (CI excludes "
        "1) are single shared double expressions (SURVEY §2.L)."
    ),
)
def returns_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    exp_ = F.col("l_discount") >= 0.05
    ret = F.col("l_returnflag") == "R"
    s = li.agg(
        F.sum((exp_ & ret).cast("bigint")).cast("bigint").alias("a"),
        F.sum((exp_ & ~ret).cast("bigint")).cast("bigint").alias("b"),
        F.sum((~exp_ & ret).cast("bigint")).cast("bigint").alias("c"),
        F.sum((~exp_ & ~ret).cast("bigint")).cast("bigint").alias("d"),
    )
    lor = F.log(
        F.col("a").cast("double") * F.col("d") / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return s.select(
        F.col("a").alias("n_exposed_returned"),
        F.col("b").alias("n_exposed_kept"),
        F.col("c").alias("n_unexposed_returned"),
        F.col("d").alias("n_unexposed_kept"),
        F.round(F.exp(lor), 4).alias("odds_ratio"),
        F.round(F.exp(lor - 1.96 * se), 4).alias("ci95_low"),
        F.round(F.exp(lor + 1.96 * se), 4).alias("ci95_high"),
        ((lor - 1.96 * se > 0) | (lor + 1.96 * se < 0)).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# join_estimate_qerror — how wrong is the uniform-key cardinality model?
# ---------------------------------------------------------------------------


def _qerror_sql(name: str, ta: str, ka: str, tb: str, kb: str) -> str:
    return f"""
SELECT '{name}' AS join_name,
       CAST(na AS BIGINT) AS n_left, CAST(nb AS BIGINT) AS n_right,
       CAST(da AS BIGINT) AS ndv_left, CAST(db AS BIGINT) AS ndv_right,
       CAST(actual AS BIGINT) AS actual_rows,
       CAST(na * nb // GREATEST(da, db) AS BIGINT) AS uniform_estimate,
       CAST(GREATEST((1000 * (na * nb // GREATEST(da, db))) // actual,
                     (1000 * actual) // (na * nb // GREATEST(da, db)))
            AS BIGINT) AS q_error_milli
FROM (
  SELECT (SELECT COUNT(*) FROM {ta} WHERE {ka} IS NOT NULL) AS na,
         (SELECT COUNT(*) FROM {tb} WHERE {kb} IS NOT NULL) AS nb,
         (SELECT COUNT(DISTINCT {ka}) FROM {ta}) AS da,
         (SELECT COUNT(DISTINCT {kb}) FROM {tb}) AS db,
         (SELECT COALESCE(SUM(ca * cb), 0) FROM
            (SELECT {ka} AS k, COUNT(*) AS ca FROM {ta}
             WHERE {ka} IS NOT NULL GROUP BY 1) a
            JOIN
            (SELECT {kb} AS k, COUNT(*) AS cb FROM {tb}
             WHERE {kb} IS NOT NULL GROUP BY 1) b USING (k)) AS actual
)"""


@register(
    "join_estimate_qerror",
    oracle="\nUNION ALL\n".join(_qerror_sql(*s) for s in _JOIN_SIZE_SPECS)
    + "\nORDER BY join_name",
    doc=(
        "Q-error audit of the textbook uniform-key join-cardinality "
        "model: for each equi-join, the System-R estimate "
        "|A|*|B|/max(ndv_A, ndv_B) vs the EXACT output size from the "
        "key-count product (join_size_estimate's machinery), with "
        "q-error = max(est/actual, actual/est) — the optimizer-"
        "observability number (Leis et al., 'How Good Are Query "
        "Optimizers, Really?', VLDB 2015) that says whether "
        "independence-assumption planning can be trusted on THIS "
        "data or the engine must rely on runtime AQE re-planning. "
        "All counts exact integers off per-table key rollups (no "
        "join materialized); q-error ships as the pure-integer "
        "q_error_milli = max((1000*est) div actual, (1000*actual) "
        "div est) -- no final ROUND(double) (SURVEY §2.G)."
    ),
)
def join_estimate_qerror(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(name: str, ta: str, ka: str, tb: str, kb: str) -> DataFrame:
        a = (
            load_table(spark, sf_dir, ta)
            .where(F.col(ka).isNotNull())
            .groupBy(F.col(ka).alias("k"))
            .agg(F.count("*").alias("ca"))
        )
        b = (
            load_table(spark, sf_dir, tb)
            .where(F.col(kb).isNotNull())
            .groupBy(F.col(kb).alias("k"))
            .agg(F.count("*").alias("cb"))
        )
        stats_a = a.agg(
            F.sum("ca").cast("bigint").alias("na"),
            F.count("*").cast("bigint").alias("da"),
        )
        stats_b = b.agg(
            F.sum("cb").cast("bigint").alias("nb"),
            F.count("*").cast("bigint").alias("db"),
        )
        actual = (
            a.join(b, "k")
            .agg(
                F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
                .cast("bigint")
                .alias("actual")
            )
        )
        est = "na * nb div GREATEST(da, db)"
        return (
            stats_a.crossJoin(F.broadcast(stats_b))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                F.col("na").alias("n_left"),
                F.col("nb").alias("n_right"),
                F.col("da").alias("ndv_left"),
                F.col("db").alias("ndv_right"),
                F.col("actual").alias("actual_rows"),
                F.expr(est).cast("bigint").alias("uniform_estimate"),
                # pure-integer q-error in milli-units over the exact
                # (est, actual) bigints (both >= 1 whenever the join is
                # non-empty) -- no final ROUND(double)
                F.greatest(
                    F.expr(f"(1000 * ({est})) div actual"),
                    F.expr(f"(1000 * actual) div ({est})"),
                )
                .cast("bigint")
                .alias("q_error_milli"),
            )
        )

    out = None
    for spec in _JOIN_SIZE_SPECS:
        df = one(*spec)
        out = df if out is None else out.unionByName(df)
    return out.orderBy("join_name")


# ---------------------------------------------------------------------------
# predicate_selectivity_report — selectivity of the standard pushed filters.
# ---------------------------------------------------------------------------


@register(
    "predicate_selectivity_report",
    oracle="""
WITH li AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_shipdate <= DATE '1998-09-02' THEN 1 ELSE 0 END)
              AS BIGINT) AS p_shipdate,
         CAST(SUM(CASE WHEN l_discount BETWEEN 0.05 AND 0.07
                        AND l_quantity < 24 THEN 1 ELSE 0 END)
              AS BIGINT) AS p_q6,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS p_returns
  FROM lineitem
),
o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderdate >= DATE '1995-01-01'
                        AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END)
              AS BIGINT) AS p_year,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS p_priority
  FROM orders
)
SELECT * FROM (
  SELECT 'lineitem' AS table_name, 'l_shipdate <= 1998-09-02' AS predicate,
         n AS n_total, p_shipdate AS n_matching,
         CAST(p_shipdate * 10000 // n AS BIGINT) AS selectivity_bps FROM li
  UNION ALL
  SELECT 'lineitem', 'q6 discount band + qty < 24', n, p_q6,
         CAST(p_q6 * 10000 // n AS BIGINT) FROM li
  UNION ALL
  SELECT 'lineitem', 'l_returnflag = R', n, p_returns,
         CAST(p_returns * 10000 // n AS BIGINT) FROM li
  UNION ALL
  SELECT 'orders', 'o_orderdate in 1995', n, p_year,
         CAST(p_year * 10000 // n AS BIGINT) FROM o
  UNION ALL
  SELECT 'orders', 'priority URGENT/HIGH', n, p_priority,
         CAST(p_priority * 10000 // n AS BIGINT) FROM o
) ORDER BY table_name, predicate
""",
    doc=(
        "Selectivity report for the engine's standard pushed "
        "predicates (the q1 shipdate ceiling, the q6 discount/qty "
        "band, returns, the 1995 order-date year, urgent/high "
        "priority): observed match counts and selectivity in exact "
        "bps — the observability layer for pushdown value (a "
        "predicate at 9,900 bps prunes nothing: drop the filter-first "
        "plan; one at 200 bps is the partition-pruning candidate "
        "range_partition_plan should key on). Each table contributes "
        "ONE conditional-aggregate scan (5 predicates, 2 scans); "
        "pure integer arithmetic (SURVEY §2.G)."
    ),
)
def predicate_selectivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("p_shipdate"),
        F.sum(
            F.when(
                F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("p_q6"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("p_returns"),
    )
    o = load_table(spark, sf_dir, "orders").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("p_year"),
        F.sum(
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("p_priority"),
    )

    def row(src, name, pred_col):
        return src.select(
            F.lit(name.split("|")[0]).alias("table_name"),
            F.lit(name.split("|")[1]).alias("predicate"),
            F.col("n").alias("n_total"),
            F.col(pred_col).alias("n_matching"),
            F.expr(f"{pred_col} * 10000 div n").cast("bigint").alias("selectivity_bps"),
        )

    out = (
        row(li, "lineitem|l_shipdate <= 1998-09-02", "p_shipdate")
        .unionByName(row(li, "lineitem|q6 discount band + qty < 24", "p_q6"))
        .unionByName(row(li, "lineitem|l_returnflag = R", "p_returns"))
        .unionByName(row(o, "orders|o_orderdate in 1995", "p_year"))
        .unionByName(row(o, "orders|priority URGENT/HIGH", "p_priority"))
    )
    return out.orderBy("table_name", "predicate")


# ---------------------------------------------------------------------------
# revenue_yoy — year-over-year monthly revenue growth.
# ---------------------------------------------------------------------------


@register(
    "revenue_yoy",
    oracle="""
WITH m AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mo,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_centi
  FROM orders GROUP BY 1, 2
),
j AS (
  SELECT cur.yr, cur.mo, cur.rev_centi,
         prev.rev_centi AS prev_rev_centi
  FROM m cur LEFT JOIN m prev ON prev.yr = cur.yr - 1 AND prev.mo = cur.mo
)
SELECT CAST(yr AS BIGINT) AS year, CAST(mo AS BIGINT) AS month,
       rev_centi, prev_rev_centi,
       CASE WHEN prev_rev_centi IS NULL OR prev_rev_centi = 0 THEN NULL
            ELSE CAST(CASE WHEN rev_centi >= prev_rev_centi
                      THEN (rev_centi - prev_rev_centi) * 10000 // prev_rev_centi
                      ELSE -((prev_rev_centi - rev_centi) * 10000 // prev_rev_centi)
                      END AS BIGINT) END AS yoy_growth_bps
FROM j ORDER BY year, month
""",
    doc=(
        "Year-over-year monthly revenue growth: each (year, month) "
        "against the same month one year earlier — the "
        "seasonality-immune growth read (revenue_mom's month-over-"
        "month number conflates growth with the seasonal cycle; YoY "
        "cancels it). Exact centi-unit integer revenue, growth in "
        "sign-split exact integer bps (the ab_test_lift convention — "
        "integer division truncates toward zero on both engines only "
        "via the split), NULL where no prior year exists. One orders "
        "scan + one (year-1)-shifted self-join of the ~84-row month "
        "rollup (SURVEY §2.G)."
    ),
)
def revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_centi")
    )
    prev = m.select(
        (F.col("yr") + 1).alias("yr"),
        F.col("mo"),
        F.col("rev_centi").alias("prev_rev_centi"),
    )
    j = m.join(F.broadcast(prev), ["yr", "mo"], "left")
    growth = F.when(
        F.col("prev_rev_centi").isNull() | (F.col("prev_rev_centi") == 0), F.lit(None)
    ).otherwise(
        F.expr(
            "CASE WHEN rev_centi >= prev_rev_centi"
            " THEN (rev_centi - prev_rev_centi) * 10000 div prev_rev_centi"
            " ELSE -((prev_rev_centi - rev_centi) * 10000 div prev_rev_centi) END"
        ).cast("bigint")
    )
    return j.select(
        F.col("yr").cast("bigint").alias("year"),
        F.col("mo").cast("bigint").alias("month"),
        "rev_centi",
        "prev_rev_centi",
        growth.alias("yoy_growth_bps"),
    ).orderBy("year", "month")


# ---------------------------------------------------------------------------
# hll_register_audit — deterministic from-scratch HLL precision audit.
# ---------------------------------------------------------------------------

# alpha_64 = 0.7213/(1 + 1.079/64) (Flajolet et al. 2007) as an e6
# integer literal — the project convention for transcendental/
# irrational constants (exact same integer on both engines)
_HLL_ALPHA64_E6 = 709340
_HLL_B = 6  # register-index bits -> m = 64 registers
_HLL_M = 1 << _HLL_B
_HLL_REM_BITS = 60 - _HLL_B  # 54-bit rank field from a 60-bit hash


def _hll_audit_oracle() -> str:
    digit = "CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)"
    h60 = (
        f"list_sum(list_transform(range(1, 16), "
        f"i -> {digit} * (1::BIGINT << ((15 - i) * 4))))"
    )
    return f"""
WITH hs AS (
  SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
hv AS (SELECT {h60} AS h60 FROM hs),
parts AS (
  SELECT h60 // (1::BIGINT << {_HLL_REM_BITS}) AS idx,
         h60 % (1::BIGINT << {_HLL_REM_BITS}) AS rem
  FROM hv
),
reg AS (
  SELECT idx,
         MAX(CASE WHEN rem = 0 THEN {_HLL_REM_BITS + 1}
                  ELSE {_HLL_REM_BITS + 1} - length(bin(rem)) END) AS m_rho
  FROM parts GROUP BY idx
),
rx AS (SELECT MAX(m_rho) AS rho_max, COUNT(*) AS n_occ FROM reg),
den AS (
  SELECT rx.rho_max, rx.n_occ,
         CAST(SUM(1::BIGINT << (rx.rho_max - reg.m_rho)) AS BIGINT)
           + ({_HLL_M} - rx.n_occ) * (1::BIGINT << rx.rho_max) AS d
  FROM reg CROSS JOIN rx GROUP BY rx.rho_max, rx.n_occ
),
tru AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
  FROM events
),
est AS (
  SELECT tru.n_events, tru.n_true, den.n_occ, den.rho_max, den.d,
         CAST(({_HLL_ALPHA64_E6}::HUGEINT * {_HLL_M * _HLL_M}
               * (1::BIGINT << den.rho_max)::HUGEINT)
              // (1000::HUGEINT * den.d) AS BIGINT) AS est_e3
  FROM den CROSS JOIN tru
)
SELECT n_events, n_true,
       CAST(n_occ AS BIGINT) AS n_occupied,
       CAST({_HLL_M} - n_occ AS BIGINT) AS n_zero,
       CAST(rho_max AS BIGINT) AS rho_max,
       d AS harmonic_denom,
       est_e3,
       CAST(ABS(est_e3 - 1000 * n_true)::HUGEINT * 10000
            // (1000::HUGEINT * n_true) AS BIGINT) AS err_bps
FROM est
"""


@register(
    "hll_register_audit",
    oracle=_hll_audit_oracle(),
    doc=(
        "HyperLogLog precision audit, the cms_freq_audit companion for "
        "distinct counting: builds a from-scratch m=64 HLL over "
        "user_id with DETERMINISTIC md5 lanes (60-bit hash = first 15 "
        "hex chars; register = top 6 bits, rank = leading zeros of "
        "the 54-bit remainder + 1 via length(bin(rem)) — exactly "
        "reproducible on any engine, unlike opaque library sketch "
        "states), then scores the raw estimate against the exact "
        "COUNT(DISTINCT). The harmonic mean stays EXACT: registers "
        "are rescaled to the common denominator 2^rho_max so "
        "sum(2^(rho_max-rho_j)) is a pure BIGINT (<= 64*2^55 < 2^62), "
        "alpha_64 is the e6 integer literal 709340, and est_e3 is one "
        "DECIMAL(38,0) division — no float anywhere. Scale shape: "
        "the register table is ONE 64-row map-side-combined max "
        "aggregate over the raw stream (duplicates hash identically; "
        "no distinct shuffle), which is why HLL is THE 100 TB "
        "distinct-count path; the exact side is the one-time "
        "calibration pass this audit exists to compare against "
        "(SURVEY §2.L)."
    ),
)
def hll_register_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rem_div = 1 << _HLL_REM_BITS
    parts = ev.select(
        F.expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
            " as bigint)"
        ).alias("h60")
    ).select(
        F.expr(f"h60 div {rem_div}L").alias("idx"),
        (F.col("h60") % F.lit(rem_div)).alias("rem"),
    )
    reg = parts.groupBy("idx").agg(
        F.max(
            F.when(F.col("rem") == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
                F.lit(_HLL_REM_BITS + 1) - F.length(F.expr("bin(rem)"))
            )
        ).alias("m_rho")
    )
    rx = reg.agg(
        F.max("m_rho").alias("rho_max"), F.count("*").alias("n_occ")
    )
    den = (
        reg.crossJoin(F.broadcast(rx))
        .groupBy("rho_max", "n_occ")
        .agg(
            (
                F.sum(F.expr("shiftleft(1L, cast(rho_max - m_rho as int))"))
                + (F.lit(_HLL_M) - F.col("n_occ"))
                * F.expr("shiftleft(1L, cast(rho_max as int))")
            )
            .cast("bigint")
            .alias("d")
        )
    )
    tru = ev.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_true"),
    )
    alpha_num = _HLL_ALPHA64_E6 * _HLL_M * _HLL_M
    return (
        den.crossJoin(F.broadcast(tru))
        .select(
            "n_events",
            "n_true",
            F.col("n_occ").cast("bigint").alias("n_occupied"),
            (F.lit(_HLL_M) - F.col("n_occ")).cast("bigint").alias("n_zero"),
            F.col("rho_max").cast("bigint").alias("rho_max"),
            F.col("d").alias("harmonic_denom"),
            F.expr(
                f"cast((cast({alpha_num} as decimal(38,0))"
                f" * cast(shiftleft(1L, cast(rho_max as int)) as decimal(38,0)))"
                f" div (cast(1000 as decimal(38,0)) * d) as bigint)"
            ).alias("est_e3"),
        )
        .withColumn(
            "err_bps",
            F.expr(
                "cast((cast(abs(est_e3 - 1000 * n_true) as decimal(38,0))"
                " * 10000) div (cast(1000 as decimal(38,0)) * n_true)"
                " as bigint)"
            ),
        )
    )

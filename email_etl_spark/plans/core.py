"""Relational core queries (SURVEY.md §2.A, §2.I) — the DataFrame
re-expression of the reference's PostgreSQL query surface
(ref: src/database.py:212-343, src/etl_pipeline.py:233-245).

Point lookups and top-Ns in the reference become declarative plans
here: at scale they run as parquet scans with pushed predicates +
TakeOrderedAndProject (no full sort, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import register


@register(
    "doc_count",
    oracle="""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
""",
    doc="Corpus stats (ref: get_email_count / storage stats, src/database.py:264, src/markdown_storage.py:254).",
)
def doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "latest_event_ts",
    oracle="SELECT CAST(MAX(ts) AS TIMESTAMP) AS latest_ts, COUNT(*) AS n_events FROM events",
    doc="Max-watermark read (ref: get_latest_email_date, src/database.py:282).",
)
def latest_event_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.max("ts").alias("latest_ts"), F.count("*").alias("n_events"))


@register(
    "recent_events_topn",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
FROM events ORDER BY ts DESC, event_id LIMIT 10
""",
    doc="Recent-N fetch (ref: get_recent_emails, src/database.py:292). Runs as TakeOrderedAndProject — no global sort.",
)
def recent_events_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), "event_id")
        .limit(10)
    )


@register(
    "events_after_date",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
FROM events WHERE ts > TIMESTAMP '2024-01-28'
ORDER BY ts DESC, event_id LIMIT 100
""",
    doc="Watermark filter + recent-N (ref: get_emails_after_date, src/database.py:306). Predicate pushes to parquet scan.",
)
def events_after_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("ts") > F.lit("2024-01-28").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), "event_id")
        .limit(100)
    )


@register(
    "by_source_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY source ORDER BY n_docs DESC, source
""",
    doc="Per-provider rollup (ref: emails_by_provider view, src/database.py:333).",
)
def by_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
        .orderBy(F.desc("n_docs"), "source")
    )


@register(
    "thread_events",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
FROM events WHERE user_id = 42 ORDER BY ts, event_id
""",
    doc="Thread fetch ordered by date (ref: get_emails_by_thread, src/database.py:234).",
)
def thread_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("user_id") == 42)
        .select("event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
    )


@register(
    "upsert_latest",
    oracle="""
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
""",
    doc="Keep-latest-per-key upsert semantics (ref: INSERT .. ON CONFLICT DO UPDATE, src/database.py:78-94). One shuffle on the key.",
)
def upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


@register(
    "missing_embeddings",
    oracle="""
SELECT d.doc_id, d.source, d.n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
ORDER BY d.doc_id
""",
    doc="Docs lacking vectors (ref: get_emails_without_embeddings, src/database.py:247) as a key-pruned anti-join.",
)
def missing_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    # no broadcast hint: the embeddings side is corpus-sized at scale,
    # so this must stay a shuffle anti-join on the key column only
    # (column-pruned to 8 bytes/row); AQE still broadcasts it at test
    # scale where it is actually small.
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "incremental_sync",
    oracle="""
WITH watermark AS (
  SELECT MAX(ts) AS max_ts FROM events WHERE ts < TIMESTAMP '2024-01-20'
)
SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id, e.event_type
FROM events e, watermark w
WHERE e.ts > w.max_ts
ORDER BY e.ts, e.event_id
LIMIT 500
""",
    doc="Incremental sync: rows newer than the stored max-date watermark (ref: run_incremental_sync, src/etl_pipeline.py:233-245).",
)
def incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # the 'already loaded' side: everything before a cutoff; its max(ts)
    # is the watermark — computed as a 1-row broadcast, not a collect.
    watermark = (
        ev.where(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        .agg(F.max("ts").alias("max_ts"))
    )
    return (
        ev.crossJoin(F.broadcast(watermark))
        .where(F.col("ts") > F.col("max_ts"))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("ts", "event_id")
        .limit(500)
    )


@register(
    "props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="JSON metadata extraction + rollup (ref: metadata JSONB column, scripts/init_db.sql:32).",
)
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "provider_status",
    oracle="""
WITH d AS (
  SELECT source, doc_id,
         DATE '2024-01-01' + CAST(doc_id // 10 AS INTEGER) AS ingest_date
  FROM documents
),
w AS (SELECT MAX(ingest_date) AS corpus_max FROM d)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(MAX(d.doc_id) AS BIGINT) AS last_doc_id,
       CAST(MAX(d.ingest_date) AS DATE) AS last_sync_date,
       CAST(SUM(CASE WHEN d.ingest_date > w.corpus_max - 7 THEN 1 ELSE 0 END) AS BIGINT) AS docs_last_7d,
       CAST(w.corpus_max - MAX(d.ingest_date) AS BIGINT) AS days_behind
FROM d CROSS JOIN w
GROUP BY d.source, w.corpus_max
ORDER BY d.source
""",
    doc=(
        "Provider registry status (ref: get_providers / provider sync "
        "metadata, src/database.py:333-391): per provider — volume, last "
        "ingested id, last-sync date under the monotone ingest mapping, "
        "7-day inflow, and staleness vs the corpus watermark. The global "
        "watermark is a 1-row broadcast (scalar agg), never a driver "
        "round-trip; the rollup is one map-side-combined shuffle."
    ),
)
def provider_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("doc_id") / 10).cast("int")).alias(
            "ingest_date"
        ),
    )
    watermark = docs.agg(F.max("ingest_date").alias("corpus_max"))
    return (
        docs.crossJoin(F.broadcast(watermark))
        .groupBy("source", "corpus_max")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("doc_id").cast("bigint").alias("last_doc_id"),
            F.max("ingest_date").alias("last_sync_date"),
            F.sum(
                (F.col("ingest_date") > F.date_sub(F.col("corpus_max"), 7)).cast("int")
            )
            .cast("bigint")
            .alias("docs_last_7d"),
        )
        .select(
            "source",
            "n_docs",
            "last_doc_id",
            "last_sync_date",
            "docs_last_7d",
            F.datediff(F.col("corpus_max"), F.col("last_sync_date"))
            .cast("bigint")
            .alias("days_behind"),
        )
        .orderBy("source")
    )


@register(
    "props_k_liftcurve",
    oracle="""
WITH e AS (
  SELECT LEAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10, 9) AS k_bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
  FROM events
)
SELECT CAST(k_bucket AS BIGINT) AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(is_purchase) AS BIGINT) AS n_purchases,
       CAST(SUM(is_purchase) * 10000 // COUNT(*) AS BIGINT) AS purchase_bps
FROM e GROUP BY k_bucket ORDER BY k_bucket
""",
    doc=(
        "Purchase-rate lift curve over the JSON metadata field k "
        "(decile-bucketed): does the propensity-like attribute in the "
        "semi-structured column actually predict conversion? — the "
        "segmentation readout a JSONB-backed store answers with "
        "expression indexes (ref: metadata JSONB, "
        "scripts/init_db.sql:32; SURVEY §2.I). JSON extraction is one "
        "JVM json_tuple-class expression per row feeding an integer "
        "bucket; the rollup is 10 cells, map-side combined, exact "
        "bps."
    ),
)
def props_k_liftcurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.least(F.expr("cast(get_json_object(props, '$.k') as int) div 10"), F.lit(9)).alias("k_bucket"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    return (
        e.groupBy("k_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("is_purchase").cast("bigint").alias("n_purchases"),
            F.expr("sum(is_purchase) * 10000L div count(*)").cast("bigint").alias("purchase_bps"),
        )
        .select(F.col("k_bucket").cast("bigint").alias("k_bucket"), "n_events", "n_purchases", "purchase_bps")
        .orderBy("k_bucket")
    )


@register(
    "props_schema_profile",
    oracle="""
WITH kv AS (
  SELECT UNNEST(json_keys(props)) AS key, props FROM events
  WHERE props IS NOT NULL
),
v AS (SELECT key, json_extract_string(props, '$.' || key) AS val FROM kv)
SELECT key,
       CAST(COUNT(*) AS BIGINT) AS n_present,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_integer,
       MIN(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN CAST(val AS BIGINT) END) AS min_int,
       MAX(CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN CAST(val AS BIGINT) END) AS max_int
FROM v GROUP BY key ORDER BY key
""",
    doc=(
        "Schema-on-read profile of the JSON metadata column: every key "
        "observed across the corpus with presence count, distinct "
        "cardinality, integer-typedness and numeric range — the "
        "schema-drift monitor a JSONB column needs before anyone "
        "writes an expression index against a key that half the rows "
        "spell differently (ref: metadata JSONB, scripts/init_db.sql:"
        "32; generalizes props_extract's fixed-key readout to the "
        "whole keyspace; SURVEY §2.I). One from_json map parse + key "
        "explode per row, then a map-side-combined per-key rollup — "
        "keyspace-sized output at any corpus size."
    ),
)
def props_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = (
        ev.where(F.col("props").isNotNull())
        .select(F.explode(F.from_json(F.col("props"), "map<string,string>")).alias("key", "val"))
    )
    is_int = F.col("val").rlike("^-?[0-9]+$")
    return (
        kv.groupBy("key")
        .agg(
            F.count("*").cast("bigint").alias("n_present"),
            F.countDistinct("val").cast("bigint").alias("n_distinct"),
            F.sum(F.when(is_int, 1).otherwise(0)).cast("bigint").alias("n_integer"),
            F.min(F.when(is_int, F.col("val").cast("bigint"))).alias("min_int"),
            F.max(F.when(is_int, F.col("val").cast("bigint"))).alias("max_int"),
        )
        .orderBy("key")
    )


@register(
    "props_variant_profile",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc=(
        "Semi-structured profile through Spark 4's VARIANT type "
        "(SPARK-45891 — the lakehouse answer to JSONB, ref: metadata "
        "JSONB column, scripts/init_db.sql:32): props parse ONCE into "
        "a binary variant (try_parse_json — malformed rows become "
        "NULL, not job failures) and every field access is "
        "try_variant_get on the decoded tree, not a re-parse of the "
        "string per path the way repeated get_json_object costs. At "
        "100 TB the parse-once/shred-many difference dominates "
        "semi-structured scans. Aggregation is one map-side-combined "
        "pass; the oracle expresses identical semantics over DuckDB's "
        "JSON reader (SURVEY §2.I)."
    ),
)
def props_variant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.try_parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_valid"),
            F.sum(F.when(k.isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_with_k"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.min(k).cast("bigint").alias("min_k"),
            F.max(k).cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "props_schema_drift",
    oracle="""
WITH e AS (
  SELECT props, event_id FROM events WHERE props IS NOT NULL
),
mid AS (SELECT (MIN(event_id) + MAX(event_id)) // 2 AS m FROM e),
kv AS (
  SELECT UNNEST(json_keys(props)) AS key,
         CASE WHEN event_id <= mid.m THEN 0 ELSE 1 END AS half
  FROM e, mid
),
n AS (
  SELECT SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
  FROM (SELECT CASE WHEN event_id <= mid.m THEN 0 ELSE 1 END AS half FROM e, mid)
),
k AS (
  SELECT key,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
  FROM kv GROUP BY key
)
SELECT key,
       CAST(c1 AS BIGINT) AS n_first,
       CAST(c2 AS BIGINT) AS n_second,
       CAST(c1 * 10000 // n.n1 AS BIGINT) AS rate_first_bps,
       CAST(c2 * 10000 // n.n2 AS BIGINT) AS rate_second_bps,
       CAST(c2 * 10000 // n.n2 - c1 * 10000 // n.n1 AS BIGINT) AS drift_bps
FROM k CROSS JOIN n ORDER BY key
""",
    doc=(
        "JSON keyspace drift between ingest halves (id-midpoint split, "
        "the embedding_drift / text_drift convention): per key, "
        "presence rate in each half and the signed drift in exact bps "
        "— completes the drift family (text, embedding, value, SCHEMA) "
        "and flags producer-side schema rollouts (a key appearing or "
        "vanishing mid-stream) before an expression index or VARIANT "
        "shred path starts missing rows. Drift is a DIFFERENCE of two "
        "already-truncated integer rates — no signed integer division "
        "whose floor/truncate semantics could split the engines. One "
        "parse + key explode, keyspace-sized rollup, 1-row half "
        "counts broadcast (SURVEY §2.I)."
    ),
)
def props_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(F.col("props").isNotNull()).select("props", "event_id")
    mid = e.agg(
        F.expr("(min(event_id) + max(event_id)) div 2").alias("m")
    )
    half = F.when(F.col("event_id") <= F.col("m"), 0).otherwise(1)
    eh = e.crossJoin(F.broadcast(mid)).select("props", half.alias("half"))
    n = eh.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n2"),
    )
    kv = eh.select(
        F.explode(F.map_keys(F.from_json(F.col("props"), "map<string,string>"))).alias(
            "key"
        ),
        "half",
    )
    k = kv.groupBy("key").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    return (
        k.crossJoin(F.broadcast(n))
        .select(
            "key",
            F.col("c1").cast("bigint").alias("n_first"),
            F.col("c2").cast("bigint").alias("n_second"),
            F.expr("c1 * 10000 div n1").cast("bigint").alias("rate_first_bps"),
            F.expr("c2 * 10000 div n2").cast("bigint").alias("rate_second_bps"),
            F.expr("c2 * 10000 div n2 - c1 * 10000 div n1")
            .cast("bigint")
            .alias("drift_bps"),
        )
        .orderBy("key")
    )

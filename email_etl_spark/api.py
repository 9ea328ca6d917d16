"""User-facing query API (SURVEY.md §1, ref: src/api/server.py +
src/api/mcp_tools.py + main.py CLI) — the operations a reference user
calls, re-expressed over DataFrames.

The reference exposes search/ask/analyze over FastAPI + MCP; the
engine's equivalent surface is composable DataFrames plus registered
SQL views, so the same operations work from pyspark, spark.sql, or any
JDBC/Thrift front end pointed at the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.functions.vectors import cosine_rounded
from email_etl_spark.io import TABLES, load_table
from email_etl_spark.llm.stub import embed_text_udf


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view so `spark.sql(...)`
    works directly (ref: the psql surface implied by init_db.sql)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def search_emails(
    spark: SparkSession,
    sf_dir: str,
    query_text: str,
    limit: int = 10,
    lang: str | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
    include_content: bool = False,
) -> DataFrame:
    """Semantic search over the document corpus with a free-text query
    (ref: search_emails MCP tool, src/api/mcp_tools.py:14-51): embed
    the query with the deterministic stub embedder, rank by cosine.
    date_from/date_to use the monotone ingest-date mapping (the
    hybrid_search_dated convention) so the window becomes a pushed id
    range, not a post-scan filter; include_content returns the full
    text instead of the 200-char snippet.

    The query embedding is one stub call on a 1-row frame, broadcast
    against the corpus — the same plan a real embedding service would
    produce at this seam."""
    from email_etl_spark.plans.search import DOCS_PER_DAY, EPOCH_DATE

    docs = load_table(spark, sf_dir, "documents")
    if lang:
        docs = docs.where(F.col("lang") == lang)
    if date_from or date_to:
        from datetime import date

        epoch = date.fromisoformat(EPOCH_DATE)
        if date_from:
            lo = (date.fromisoformat(date_from[:10]) - epoch).days * DOCS_PER_DAY
            docs = docs.where(F.col("doc_id") >= lo)
        if date_to:
            hi = ((date.fromisoformat(date_to[:10]) - epoch).days + 1) * DOCS_PER_DAY - 1
            docs = docs.where(F.col("doc_id") <= hi)
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id)
    qvec_df = (
        spark.createDataFrame([(query_text,)], ["q"])
        .select(embed_text_udf()(F.col("q")).alias("qvec"))
    )
    content = F.col("text") if include_content else F.substring("text", 1, 200)
    return (
        corpus.crossJoin(F.broadcast(qvec_df))
        .select(
            "doc_id",
            "lang",
            "source",
            cosine_rounded(F.col("embedding"), F.col("qvec")).alias("similarity"),
            content.alias("snippet"),
        )
        .orderBy(F.desc("similarity"), "doc_id")
        .limit(limit)
    )


def ask_question_context(
    spark: SparkSession,
    sf_dir: str,
    question: str,
    context_limit: int = 5,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """RAG context assembly (ref: answer_question,
    src/llm_integration.py:233-307 minus the generation call): search,
    rank, and compose the context block the LLM would receive."""
    hits = search_emails(
        spark, sf_dir, question, limit=context_limit,
        date_from=date_from, date_to=date_to,
    )
    blocks = hits.select(
        F.struct(
            (-F.col("similarity")).alias("neg_sim"),
            F.col("doc_id").alias("doc_id"),
            F.concat(
                F.lit("Doc "), F.col("doc_id").cast("string"),
                F.lit(" (similarity "), F.col("similarity").cast("string"),
                F.lit("):\n"), F.col("snippet"),
            ).alias("block"),
        ).alias("entry")
    )
    return blocks.agg(
        F.count("*").alias("n_sources"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("entry")), lambda e: e["block"]),
            "\n---\n",
        ).alias("context"),
    ).select(F.lit(question).alias("question"), "n_sources", "context")


def analyze_patterns(
    spark: SparkSession, sf_dir: str, group_by: str = "user", days: int | None = None
) -> DataFrame:
    """analyze_email_patterns with the reference's group_by enum
    (ref: src/api/mcp_tools.py:204-224)."""
    from email_etl_spark.plans.registry import REGISTRY

    name = {
        "user": "patterns_by_user",
        "sender": "patterns_by_user",
        "domain": "patterns_by_domain",
        "label": "patterns_by_type",
        "type": "patterns_by_type",
        "day": "patterns_by_day",
        "week": "patterns_by_week",
    }.get(group_by)
    if name is None:
        raise ValueError(f"unknown group_by {group_by!r}")
    return REGISTRY[name].builder(spark, sf_dir)

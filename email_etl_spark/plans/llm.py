"""LLM-enrichment queries (SURVEY.md §2.K) — the categorization
surface (ref: categorize_emails, src/llm_integration.py:61-114) run
through the deterministic stub client (llm/stub.py).

The stub derives category/priority/action from sha256 bytes of the
text, which makes the WHOLE enrichment pipeline oracle-checkable:
DuckDB reproduces the same sha256 and the same byte arithmetic, so
the Arrow-batched pandas_udf boundary (the exact seam a real LLM
client plugs into) is verified end-to-end, not just rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.llm.stub import CATEGORIES, PRIORITIES, categorize_documents
from email_etl_spark.plans.registry import register

_HEX = "0123456789abcdef"


def _byte_sql(i: int) -> str:
    """sha256 byte i (0-based) of `text` as an integer, from the hex
    string DuckDB's sha256 returns."""
    hi = f"(strpos('{_HEX}', substr(sha256(text), {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('{_HEX}', substr(sha256(text), {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _pick_sql(options: tuple[str, ...], byte_expr: str) -> str:
    arr = "[" + ", ".join(f"'{o}'" for o in options) + "]"
    return f"{arr}[({byte_expr} % {len(options)}) + 1]"


_SUMMARY_SQL = (
    "array_to_string(list_filter(str_split_regex(text, '\\s+'), x -> x <> '')[1:12], ' ')"
)


@register(
    "categorize_docs",
    oracle=f"""
SELECT doc_id,
       {_pick_sql(CATEGORIES, _byte_sql(0))} AS category,
       {_pick_sql(PRIORITIES, _byte_sql(1))} AS priority,
       {_byte_sql(2)} % 2 = 1 AS action_required,
       {_SUMMARY_SQL} AS summary
FROM documents ORDER BY doc_id
""",
    doc=(
        "LLM categorization contract over the corpus (category, priority, "
        "action_required, 12-word summary) via the deterministic stub "
        "client — verifies the Arrow pandas_udf enrichment seam "
        "end-to-end against a byte-level SQL oracle (SURVEY §2.K)."
    ),
)
def categorize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        categorize_documents(docs)
        .select("doc_id", "category", "priority", "action_required", "summary")
        .orderBy("doc_id")
    )

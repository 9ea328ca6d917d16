"""MCP tool-contract registry (ref: src/api/mcp_tools.py:13-240 and
src/api/models.py:13-33) — the typed tool-definition surface the
reference exposes over its /mcp endpoints, mapped 1:1 onto engine
queries.

Each reference tool keeps its exact parameter contract (names, types,
required flags, defaults, enums) and gains an `engine_query` binding
naming the registry query / api function that computes it. Parameter
validation here actually enforces declared types and enums — the
reference's validate_mcp_parameters marks type validation as a TODO
(mcp_tools.py:262-264) while its FastAPI layer relies on pydantic; a
dataclass registry keeps the engine dependency-free.

The HTTP/MCP transport itself is out of scope for an engine: run_tool
is the seam a FastAPI/MCP server would call with already-deserialized
JSON params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPE_CHECKS: dict[str, tuple[type, ...]] = {
    "string": (str,),
    "integer": (int,),
    "boolean": (bool,),
    "array": (list, tuple),
    "object": (dict,),
}


@dataclass(frozen=True)
class ToolParam:
    name: str
    type: str
    description: str
    required: bool = False
    default: Any = None
    enum: tuple[str, ...] | None = None


@dataclass(frozen=True)
class ToolDef:
    name: str
    description: str
    parameters: tuple[ToolParam, ...]
    engine_query: str  # the registry query / api function backing it

    def dump(self) -> dict[str, Any]:
        """Wire-format dict (the reference's model_dump shape)."""
        return {
            "name": self.name,
            "description": self.description,
            "parameters": [
                {
                    "name": p.name,
                    "type": p.type,
                    "description": p.description,
                    "required": p.required,
                    "default": p.default,
                    "enum": list(p.enum) if p.enum else None,
                }
                for p in self.parameters
            ],
        }


MCP_TOOLS: tuple[ToolDef, ...] = (
    ToolDef(
        "search_emails",
        "Search emails using semantic similarity. Uses vector embeddings "
        "to find emails with similar meaning to your query.",
        (
            ToolParam("query", "string", "Natural language search query for semantic matching", required=True),
            ToolParam("limit", "integer", "Maximum number of results to return (1-100)", default=10),
            ToolParam("date_from", "string", "ISO 8601 datetime to filter emails after this date"),
            ToolParam("date_to", "string", "ISO 8601 datetime to filter emails before this date"),
            ToolParam("include_content", "boolean", "Whether to include full email content in results", default=False),
        ),
        engine_query="api.search_emails (semantic_topk / semantic_topk_dated family)",
    ),
    ToolDef(
        "ask_email_question",
        "Ask a natural language question about your emails. Uses RAG to "
        "find relevant emails and generate an answer.",
        (
            ToolParam("question", "string", "Natural language question about your emails", required=True),
            ToolParam("context_limit", "integer", "Number of relevant emails to use as context (1-20)", default=5),
            ToolParam("date_from", "string", "ISO 8601 datetime to only consider emails after this date"),
            ToolParam("date_to", "string", "ISO 8601 datetime to only consider emails before this date"),
        ),
        engine_query="api.ask_question_context (rag_context)",
    ),
    ToolDef(
        "categorize_emails",
        "Categorize emails using AI to determine type, priority, and required actions.",
        (
            ToolParam("email_ids", "array", "List of specific email database IDs to categorize"),
            ToolParam("limit", "integer", "Number of recent emails to categorize if no IDs provided (1-50)", default=10),
        ),
        engine_query="categorize_docs",
    ),
    ToolDef(
        "extract_action_items",
        "Extract action items, tasks, and commitments from recent emails.",
        (
            ToolParam("days", "integer", "Extract actions from emails in the last N days (1-90)", default=7),
            ToolParam("limit", "integer", "Maximum number of emails to process (1-100)", default=50),
        ),
        engine_query="action_items",
    ),
    ToolDef(
        "import_emails",
        "Import emails from Gmail with optional filters. Includes "
        "attachment processing and embedding generation.",
        (
            ToolParam("query", "string", "Gmail search query (e.g., 'from:example@email.com', 'subject:invoice')", default=""),
            ToolParam("max_results", "integer", "Maximum number of emails to import"),
            ToolParam("start_date", "string", "ISO 8601 datetime to import emails after this date"),
            ToolParam("generate_embeddings", "boolean", "Whether to generate vector embeddings for imported emails", default=True),
        ),
        engine_query="sources.email_source.read_mbox -> llm.stub.embed (bulk-archive ingest)",
    ),
    ToolDef(
        "sync_emails",
        "Perform incremental sync to import only new emails since last import.",
        (),
        engine_query="incremental_sync",
    ),
    ToolDef(
        "get_email_by_id",
        "Retrieve a specific email by its database ID, including full "
        "content and metadata.",
        (
            ToolParam("email_id", "integer", "Database ID of the email to retrieve", required=True),
            ToolParam("include_attachments", "boolean", "Whether to include attachment metadata", default=True),
        ),
        engine_query="doc_by_id",
    ),
    ToolDef(
        "get_system_status",
        "Get current system status including database statistics and "
        "storage information.",
        (),
        engine_query="provider_status",
    ),
    ToolDef(
        "summarize_thread",
        "Generate a summary of an email thread including participants, "
        "decisions, and action items.",
        (
            ToolParam("thread_id", "string", "Gmail thread ID to summarize", required=True),
        ),
        engine_query="thread_summary",
    ),
    ToolDef(
        "analyze_email_patterns",
        "Analyze email patterns to generate insights about communication "
        "habits and trends.",
        (
            ToolParam("days", "integer", "Analyze emails from the last N days (1-365)", default=30),
            ToolParam(
                "group_by", "string",
                "How to group analysis: 'sender', 'domain', 'label', 'day', 'week'",
                default="sender",
                enum=("sender", "domain", "label", "day", "week"),
            ),
        ),
        engine_query="api.analyze_patterns (patterns_by_user/_domain/_type/_day/_week)",
    ),
)


def get_tool(name: str) -> ToolDef:
    for tool in MCP_TOOLS:
        if tool.name == name:
            return tool
    raise ValueError(f"MCP tool '{name}' not found")


def tool_definitions() -> list[dict[str, Any]]:
    """All tool contracts in wire format (ref: get_mcp_tool_definitions)."""
    return [t.dump() for t in MCP_TOOLS]


def validate_params(tool_name: str, params: dict[str, Any]) -> dict[str, Any]:
    """Validate call parameters against a tool's contract and return
    the cleaned dict with defaults applied (ref:
    validate_mcp_parameters, mcp_tools.py:243-269 — plus the type and
    enum enforcement the reference declares but defers)."""
    tool = get_tool(tool_name)
    known = {p.name for p in tool.parameters}
    unknown = set(params) - known
    if unknown:
        raise ValueError(
            f"Unknown parameter(s) {sorted(unknown)} for tool '{tool_name}'"
        )
    cleaned: dict[str, Any] = {}
    for p in tool.parameters:
        value = params.get(p.name)
        if p.required and value is None:
            raise ValueError(
                f"Required parameter '{p.name}' missing for tool '{tool_name}'"
            )
        if value is None and p.default is not None:
            value = p.default
        if value is None:
            continue
        expected = _TYPE_CHECKS[p.type]
        # bool is an int subclass: reject True for integer params
        if not isinstance(value, expected) or (
            p.type == "integer" and isinstance(value, bool)
        ):
            raise TypeError(
                f"Parameter '{p.name}' of tool '{tool_name}' expects "
                f"{p.type}, got {type(value).__name__}"
            )
        if p.enum is not None and value not in p.enum:
            raise ValueError(
                f"Parameter '{p.name}' of tool '{tool_name}' must be one "
                f"of {list(p.enum)}, got {value!r}"
            )
        cleaned[p.name] = value
    return cleaned


# ---------------------------------------------------------------------------
# Dispatch: tool name -> engine execution. Every runner is real engine
# code over (spark, sf_dir) + cleaned params; import_emails addition-
# ally takes the archive path a serving layer would configure (the
# engine's stand-in for the reference's Gmail API connection).
# ---------------------------------------------------------------------------


def _docs_last_days(spark, sf_dir: str, days: int) -> DataFrame:
    """Docs from the corpus's trailing N-day window under the monotone
    ingest-date mapping (doc k arrives on EPOCH + k div DOCS_PER_DAY):
    the window is an id range computed from the max id — one tiny agg
    broadcast back, no driver-side date math over rows."""
    from email_etl_spark.io import load_table
    from email_etl_spark.plans.search import DOCS_PER_DAY

    docs = load_table(spark, sf_dir, "documents")
    cutoff = docs.agg(
        (F.max("doc_id") - F.lit(days * DOCS_PER_DAY)).alias("lo")
    )
    return docs.crossJoin(F.broadcast(cutoff)).where(F.col("doc_id") > F.col("lo")).drop("lo")


def _run_search(spark, sf_dir, p):
    from email_etl_spark import api

    return api.search_emails(
        spark, sf_dir, p["query"], limit=p.get("limit", 10),
        date_from=p.get("date_from"), date_to=p.get("date_to"),
        include_content=p.get("include_content", False),
    )


def _run_ask(spark, sf_dir, p):
    from email_etl_spark import api

    return api.ask_question_context(
        spark, sf_dir, p["question"], context_limit=p.get("context_limit", 5),
        date_from=p.get("date_from"), date_to=p.get("date_to"),
    )


def _run_categorize(spark, sf_dir, p):
    from email_etl_spark.plans.registry import REGISTRY

    cats = REGISTRY["categorize_docs"].builder(spark, sf_dir)
    if p.get("email_ids"):
        return cats.where(F.col("doc_id").isin(list(p["email_ids"])))
    # "recent" under the monotone ingest mapping = highest ids
    return cats.orderBy(F.desc("doc_id")).limit(p.get("limit", 10))


def _run_actions(spark, sf_dir, p):
    from email_etl_spark.plans.llm import action_items

    recent = _docs_last_days(spark, sf_dir, p.get("days", 7)).select("doc_id")
    items = action_items(spark, sf_dir)
    return (
        items.join(F.broadcast(recent), "doc_id")
        .orderBy("doc_id", "description")
        .limit(p.get("limit", 50))
    )


def _run_import(spark, sf_dir, p, archive_path: str | None = None):
    if archive_path is None:
        raise ValueError(
            "import_emails needs the mbox archive path the serving layer "
            "configures (the engine's Gmail-connection stand-in)"
        )
    from email_etl_spark.llm.stub import embed_text_udf
    from email_etl_spark.sources.email_source import read_mbox

    parsed = read_mbox(spark, archive_path)
    if p.get("query"):
        # Gmail 'subject:foo' / 'from:addr' / bare-text queries become
        # filters over the canonical parsed columns
        q = p["query"]
        if q.startswith("subject:"):
            parsed = parsed.where(F.col("subject").contains(q[len("subject:"):]))
        elif q.startswith("from:"):
            parsed = parsed.where(F.col("sender").contains(q[len("from:"):]))
        else:
            parsed = parsed.where(F.col("body_markdown").contains(q))
    if p.get("max_results"):
        parsed = parsed.limit(p["max_results"])
    if p.get("generate_embeddings", True):
        parsed = parsed.withColumn(
            "embedding",
            embed_text_udf()(F.coalesce(F.col("body_markdown"), F.lit(""))),
        )
    return parsed


def _run_sync(spark, sf_dir, p):
    from email_etl_spark.plans.core import incremental_sync

    return incremental_sync(spark, sf_dir)


def _run_get_by_id(spark, sf_dir, p):
    from email_etl_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") == p["email_id"]
    )
    if p.get("include_attachments", True):
        # row-local attachment derivation AFTER the pushed id filter:
        # the arrays are only built for the one requested row
        from email_etl_spark.plans.attachments import derived_attachment_emails

        return derived_attachment_emails(docs)
    return docs


def _run_status(spark, sf_dir, p):
    from email_etl_spark.plans.core import provider_status

    return provider_status(spark, sf_dir)


def _run_summarize(spark, sf_dir, p):
    from email_etl_spark.plans.patterns import thread_summary

    # the registry query summarizes every thread (keyed by user_id, the
    # corpus's thread analog); the tool filters to the requested one —
    # the contract's string id matched against the engine key
    return thread_summary(spark, sf_dir).where(
        F.col("user_id").cast("string") == p["thread_id"]
    )


def _run_patterns(spark, sf_dir, p):
    from email_etl_spark import api

    return api.analyze_patterns(
        spark, sf_dir, group_by=p.get("group_by", "sender"), days=p.get("days", 30)
    )


_DISPATCH: dict[str, Callable] = {
    "search_emails": _run_search,
    "ask_email_question": _run_ask,
    "categorize_emails": _run_categorize,
    "extract_action_items": _run_actions,
    "import_emails": _run_import,
    "sync_emails": _run_sync,
    "get_email_by_id": _run_get_by_id,
    "get_system_status": _run_status,
    "summarize_thread": _run_summarize,
    "analyze_email_patterns": _run_patterns,
}


def run_tool(
    spark: SparkSession,
    sf_dir: str,
    tool_name: str,
    params: dict[str, Any] | None = None,
    **engine_kwargs: Any,
) -> DataFrame:
    """Validate params against the tool contract, then execute the
    bound engine query. engine_kwargs carry serving-layer bindings
    that are not part of the MCP contract (import_emails'
    archive_path)."""
    cleaned = validate_params(tool_name, params or {})
    runner = _DISPATCH[tool_name]
    return runner(spark, sf_dir, cleaned, **engine_kwargs)

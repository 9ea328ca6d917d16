"""MCP tool-contract parity (ref: src/api/mcp_tools.py:13-240): the
engine must expose the reference's exact tool inventory and parameter
schemas, each bound to a real engine query. The expected contract
below is transcribed from the reference so any drift — a renamed
param, a changed default, a lost enum — fails loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from email_etl_spark import mcp
from tests.conftest import SF_SMOKE

# (name, type, required, default, enum) per parameter, per tool —
# the reference contract, transcribed from src/api/mcp_tools.py
REFERENCE_CONTRACT = {
    "search_emails": [
        ("query", "string", True, None, None),
        ("limit", "integer", False, 10, None),
        ("date_from", "string", False, None, None),
        ("date_to", "string", False, None, None),
        ("include_content", "boolean", False, False, None),
    ],
    "ask_email_question": [
        ("question", "string", True, None, None),
        ("context_limit", "integer", False, 5, None),
        ("date_from", "string", False, None, None),
        ("date_to", "string", False, None, None),
    ],
    "categorize_emails": [
        ("email_ids", "array", False, None, None),
        ("limit", "integer", False, 10, None),
    ],
    "extract_action_items": [
        ("days", "integer", False, 7, None),
        ("limit", "integer", False, 50, None),
    ],
    "import_emails": [
        ("query", "string", False, "", None),
        ("max_results", "integer", False, None, None),
        ("start_date", "string", False, None, None),
        ("generate_embeddings", "boolean", False, True, None),
    ],
    "sync_emails": [],
    "get_email_by_id": [
        ("email_id", "integer", True, None, None),
        ("include_attachments", "boolean", False, True, None),
    ],
    "get_system_status": [],
    "summarize_thread": [
        ("thread_id", "string", True, None, None),
    ],
    "analyze_email_patterns": [
        ("days", "integer", False, 30, None),
        ("group_by", "string", False, "sender",
         ["sender", "domain", "label", "day", "week"]),
    ],
}


def test_tool_inventory_matches_reference():
    assert [t.name for t in mcp.MCP_TOOLS] == list(REFERENCE_CONTRACT)


def test_parameter_schemas_match_reference():
    for tool in mcp.MCP_TOOLS:
        got = [
            (p.name, p.type, p.required, p.default,
             list(p.enum) if p.enum else None)
            for p in tool.parameters
        ]
        assert got == REFERENCE_CONTRACT[tool.name], tool.name


def test_every_tool_has_engine_binding_and_dispatch():
    for tool in mcp.MCP_TOOLS:
        assert tool.engine_query, tool.name
        assert tool.name in mcp._DISPATCH, tool.name
    assert set(mcp._DISPATCH) == {t.name for t in mcp.MCP_TOOLS}


def test_validation_required_defaults_types_enums():
    # required missing
    with pytest.raises(ValueError, match="Required parameter 'query'"):
        mcp.validate_params("search_emails", {})
    # defaults applied
    cleaned = mcp.validate_params("search_emails", {"query": "spark"})
    assert cleaned == {"query": "spark", "limit": 10, "include_content": False}
    # unknown param rejected
    with pytest.raises(ValueError, match="Unknown parameter"):
        mcp.validate_params("sync_emails", {"bogus": 1})
    # type mismatch rejected (bool is not an integer)
    with pytest.raises(TypeError, match="expects integer"):
        mcp.validate_params("search_emails", {"query": "x", "limit": True})
    with pytest.raises(TypeError, match="expects string"):
        mcp.validate_params("search_emails", {"query": 42})
    # enum enforced
    with pytest.raises(ValueError, match="must be one of"):
        mcp.validate_params("analyze_email_patterns", {"group_by": "hour"})
    # unknown tool
    with pytest.raises(ValueError, match="not found"):
        mcp.get_tool("launch_missiles")


def test_tool_definitions_wire_format():
    dumped = mcp.tool_definitions()
    assert len(dumped) == 10
    search = dumped[0]
    assert search["name"] == "search_emails"
    assert search["parameters"][0] == {
        "name": "query", "type": "string",
        "description": "Natural language search query for semantic matching",
        "required": True, "default": None, "enum": None,
    }


def test_run_tool_dispatch_smoke(spark):
    rows = mcp.run_tool(
        spark, SF_SMOKE, "search_emails", {"query": "quarterly report", "limit": 3}
    ).collect()
    assert len(rows) == 3
    assert {"doc_id", "similarity", "snippet"} <= set(rows[0].asDict())
    # include_content returns untruncated text
    full = mcp.run_tool(
        spark, SF_SMOKE, "search_emails",
        {"query": "quarterly report", "limit": 3, "include_content": True},
    ).collect()
    assert max(len(r.snippet) for r in full) >= max(len(r.snippet) for r in rows)

    one = mcp.run_tool(spark, SF_SMOKE, "get_email_by_id", {"email_id": 7}).collect()
    assert len(one) == 1 and one[0].message_id is not None

    ask = mcp.run_tool(spark, SF_SMOKE, "ask_email_question", {"question": "spark?"}).collect()
    assert len(ask) == 1 and ask[0].n_sources == 5

    cats = mcp.run_tool(spark, SF_SMOKE, "categorize_emails", {"limit": 4}).collect()
    assert len(cats) == 4

    byid = mcp.run_tool(
        spark, SF_SMOKE, "categorize_emails", {"email_ids": [1, 2]}
    ).collect()
    assert sorted(r.doc_id for r in byid) == [1, 2]

    acts = mcp.run_tool(
        spark, SF_SMOKE, "extract_action_items", {"days": 14, "limit": 5}
    ).collect()
    assert len(acts) <= 5

    status = mcp.run_tool(spark, SF_SMOKE, "get_system_status").collect()
    assert len(status) >= 1

    sync = mcp.run_tool(spark, SF_SMOKE, "sync_emails")
    assert sync.count() >= 0

    pat = mcp.run_tool(
        spark, SF_SMOKE, "analyze_email_patterns", {"group_by": "domain"}
    ).collect()
    assert len(pat) > 0

    summ = mcp.run_tool(spark, SF_SMOKE, "summarize_thread", {"thread_id": "1"}).collect()
    assert len(summ) == 1 and summ[0].n_events > 0


def test_run_tool_import_emails(spark, tmp_path):
    mbox = tmp_path / "archive.mbox"
    mbox.write_text(
        "From alice@example.com Thu Jan  4 09:00:00 2024\n"
        "From: Alice <alice@example.com>\nTo: bob@example.com\n"
        "Subject: invoice 42\nDate: Thu, 4 Jan 2024 09:00:00 +0000\n\n"
        "Please pay invoice 42.\n\n"
        "From carol@example.com Thu Jan  4 10:00:00 2024\n"
        "From: Carol <carol@example.com>\nTo: bob@example.com\n"
        "Subject: lunch\nDate: Thu, 4 Jan 2024 10:00:00 +0000\n\n"
        "Lunch at noon?\n"
    )
    with pytest.raises(ValueError, match="archive path"):
        mcp.run_tool(spark, SF_SMOKE, "import_emails", {})
    got = mcp.run_tool(
        spark, SF_SMOKE, "import_emails",
        {"query": "subject:invoice"}, archive_path=str(mbox),
    ).collect()
    assert len(got) == 1
    assert got[0].sender == "alice@example.com"
    assert len(got[0].embedding) > 0

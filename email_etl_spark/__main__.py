"""CLI for the engine (ref: main.py's click CLI surface) —
`python -m email_etl_spark <command>`.

Commands mirror the reference's verbs over the Spark engine:

  query <name> [--sf-dir D] [--limit N]   run a registry query
  explain <name>                          print a query's physical plan
  list                                    list registry queries
  search <text> [--limit N] [--lang L]    semantic search
  ask <question> [--context N]            RAG context assembly
  patterns <sender|domain|label|day|week> pattern analytics
  status [--sf-dir D]                     corpus stats
  import <mbox> [--query Q] [--max-results N] [--no-embeddings]
                                          bulk-archive ingest
  sync                                    incremental sync preview
  categorize [--limit N | --ids 1,2]      LLM categorization contract
  actions [--days N] [--limit N]          action-item extraction
  estimate-cost [-t N] [-a N]             embedding cost arithmetic
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="email_etl_spark")
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_query = sub.add_parser("query")
    p_query.add_argument("name")
    p_query.add_argument("--limit", type=int, default=20)

    p_explain = sub.add_parser("explain")
    p_explain.add_argument("name")

    sub.add_parser("list")

    p_search = sub.add_parser("search")
    p_search.add_argument("text")
    p_search.add_argument("--limit", type=int, default=10)
    p_search.add_argument("--lang", default=None)

    p_ask = sub.add_parser("ask")
    p_ask.add_argument("question")
    p_ask.add_argument("--context", type=int, default=5)

    p_pat = sub.add_parser("patterns")
    p_pat.add_argument(
        "group_by", choices=["user", "sender", "domain", "label", "day", "week"]
    )

    sub.add_parser("status")

    p_imp = sub.add_parser("import")
    p_imp.add_argument("mbox")
    p_imp.add_argument("--query", default="")
    p_imp.add_argument("--max-results", type=int, default=None)
    p_imp.add_argument("--no-embeddings", action="store_true")

    sub.add_parser("sync")

    p_cat = sub.add_parser("categorize")
    p_cat.add_argument("--limit", type=int, default=10)
    p_cat.add_argument("--ids", default=None, help="comma-separated doc ids")

    p_act = sub.add_parser("actions")
    p_act.add_argument("--days", type=int, default=7)
    p_act.add_argument("--limit", type=int, default=50)

    p_est = sub.add_parser("estimate-cost")
    p_est.add_argument("--text-count", "-t", type=int, default=1000)
    p_est.add_argument("--avg-tokens", "-a", type=int, default=500)

    args = ap.parse_args(argv)

    from email_etl_spark.plans.registry import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:28s} [{kind}] {q.doc.splitlines()[0][:90]}")
        return 0
    if args.cmd == "estimate-cost":
        # the reference's arithmetic (src/embeddings.py:191-204):
        # text-embedding-3-small at $0.02 per 1M tokens
        total_tokens = args.text_count * args.avg_tokens
        cost = round(total_tokens / 1_000_000 * 0.02, 4)
        print(f"text_count: {args.text_count}")
        print(f"estimated_tokens: {total_tokens}")
        print(f"estimated_cost_usd: {cost}")
        return 0

    from email_etl_spark.session import get_spark

    spark = get_spark("email-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        REGISTRY[args.name].builder(spark, args.sf_dir).show(args.limit, truncate=80)
    elif args.cmd == "explain":
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = REGISTRY[args.name].builder(spark, args.sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(df._jdf.queryExecution().explainString(mode))
    elif args.cmd == "search":
        from email_etl_spark.api import search_emails

        search_emails(spark, args.sf_dir, args.text, args.limit, args.lang).show(
            args.limit, truncate=60
        )
    elif args.cmd == "ask":
        from email_etl_spark.api import ask_question_context

        row = ask_question_context(spark, args.sf_dir, args.question, args.context).first()
        print(f"question: {row.question}\nsources: {row.n_sources}\n\n{row.context}")
    elif args.cmd == "patterns":
        from email_etl_spark.api import analyze_patterns

        analyze_patterns(spark, args.sf_dir, args.group_by).show(30, truncate=40)
    elif args.cmd == "status":
        REGISTRY["doc_count"].builder(spark, args.sf_dir).show()
        REGISTRY["by_source_stats"].builder(spark, args.sf_dir).show(5)
    elif args.cmd == "import":
        from email_etl_spark import mcp

        params = {"query": args.query, "generate_embeddings": not args.no_embeddings}
        if args.max_results is not None:
            params["max_results"] = args.max_results
        df = mcp.run_tool(
            spark, args.sf_dir, "import_emails", params, archive_path=args.mbox
        )
        df.select(
            "message_id", "sender", "subject", "date", "has_attachments"
        ).show(20, truncate=40)
        print(f"imported: {df.count()} messages")
    elif args.cmd == "sync":
        from email_etl_spark import mcp

        mcp.run_tool(spark, args.sf_dir, "sync_emails").show(20, truncate=40)
    elif args.cmd == "categorize":
        from email_etl_spark import mcp

        params: dict = {"limit": args.limit}
        if args.ids:
            params = {"email_ids": [int(x) for x in args.ids.split(",")]}
        mcp.run_tool(spark, args.sf_dir, "categorize_emails", params).show(
            args.limit, truncate=40
        )
    elif args.cmd == "actions":
        from email_etl_spark import mcp

        mcp.run_tool(
            spark, args.sf_dir, "extract_action_items",
            {"days": args.days, "limit": args.limit},
        ).show(args.limit, truncate=60)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

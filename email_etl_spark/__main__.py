"""CLI for the engine (ref: main.py's click CLI surface) —
`python -m email_etl_spark <command>`.

Commands mirror the reference's verbs over the Spark engine:

  query <name> [--sf-dir D] [--limit N]   run a registry query
  list                                    list registry queries
  search <text> [--limit N] [--lang L]    semantic search
  ask <question> [--context N]            RAG context assembly
  patterns <user|label|day|week>          pattern analytics
  status [--sf-dir D]                     corpus stats
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

    sub.add_parser("list")

    p_search = sub.add_parser("search")
    p_search.add_argument("text")
    p_search.add_argument("--limit", type=int, default=10)
    p_search.add_argument("--lang", default=None)

    p_ask = sub.add_parser("ask")
    p_ask.add_argument("question")
    p_ask.add_argument("--context", type=int, default=5)

    p_pat = sub.add_parser("patterns")
    p_pat.add_argument("group_by", choices=["user", "label", "day", "week"])

    sub.add_parser("status")

    args = ap.parse_args(argv)

    from email_etl_spark.plans.registry import REGISTRY

    if args.cmd == "list":
        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:28s} [{kind}] {q.doc.splitlines()[0][:90]}")
        return 0

    from email_etl_spark.session import get_spark

    spark = get_spark("email-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        REGISTRY[args.name].builder(spark, args.sf_dir).show(args.limit, truncate=80)
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

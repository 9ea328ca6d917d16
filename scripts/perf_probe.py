#!/usr/bin/env python
"""Per-query perf probe for the optimization rounds (guide §1).

For each named query (default: the headline suite) this measures, on
the bench session and corpus:
  - collect_s : best-of-N of the bench methodology (builder + .collect)
  - noop_s    : best-of-N of builder + noop sink (computes every column,
                no driver result transfer — guide §1.4)
  - build_s   : one cold builder+analysis invocation (plan-build cost)
and optionally writes `.explain("formatted")` to plans/r10/<q>_<tag>.txt.

Usage:
  python scripts/perf_probe.py [--tag before|after] [--explain] [--runs N]
                               [--sf-dir DIR] [query ...]

Timings print as one JSON line per query; never committed as bench
numbers (bench.py stays the bench contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/r10/<q>_<tag>.txt")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from email_etl_spark.plans.registry import REGISTRY, headline_queries
    from email_etl_spark.session import get_spark

    spark = get_spark("perf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or [q.name for q in headline_queries()]
    REGISTRY["doc_count"].builder(spark, args.sf_dir).collect()  # warmup

    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r10")
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = q.builder(spark, args.sf_dir)
        build_s = time.perf_counter() - t0

        if args.tag:
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan_txt)

        best_c = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.builder(spark, args.sf_dir).collect()
            best_c = min(best_c, time.perf_counter() - t0)

        best_n = None
        if args.noop:
            best_n = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                q.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                best_n = min(best_n, time.perf_counter() - t0)
            best_n = round(best_n, 3)

        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "collect_s": round(best_c, 3),
                    "noop_s": best_n,
                    "build_s": round(build_s, 3),
                    "runs": args.runs,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

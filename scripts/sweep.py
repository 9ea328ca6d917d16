#!/usr/bin/env python
"""Full oracle-parity sweep — the driver-gate mirror, runnable in one
command. Runs every registered query on Spark AND its DuckDB oracle
at the given scale factors and reports hash mismatches.

Usage: python scripts/sweep.py [sf_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from pyspark.sql import SparkSession

    # vanilla session on purpose: the external driver does NOT use
    # session.py, so the sweep must pass without engine-tuned confs
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.registry import REGISTRY
    from tests.oracle import compare

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    failures = 0
    total = 0
    results: dict[str, dict] = {}
    col_hashes: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        for name, q in sorted(REGISTRY.items()):
            if not q.oracle:
                results.setdefault(name, {})[sf_key] = "no-oracle"
                continue
            total += 1
            rec: dict = {}
            problems = compare(name, spark, sf_dir, q.builder, q.oracle, record=rec)
            results.setdefault(name, {})[sf_key] = problems or "ok"
            # per-output-column hashes (VERDICT r9 #5): a future red
            # names its divergent column by diffing these
            col_hashes.setdefault(name, {})[sf_key] = rec.get("col_hashes", {})
            if problems:
                failures += 1
                print(f"FAIL {sf_dir} {name}: {problems}")
    # committed artifact: the repo-side gate record for this round
    # (VERDICT r1 item 10 — catch repo-green vs driver-green divergence
    # before the driver runs)
    import json

    out = {
        "checks": total,
        "failures": failures,
        "sf_dirs": sf_dirs,
        "queries": results,
        "col_hashes": col_hashes,
    }
    with open(os.path.join(os.path.dirname(__file__), "..", "SWEEP.json"), "w") as fh:
        json.dump(out, fh, indent=1, default=str)
    print(f"sweep: {failures} failures of {total} checks across {len(sf_dirs)} SFs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

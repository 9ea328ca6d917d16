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
    for sf_dir in sf_dirs:
        for name, q in sorted(REGISTRY.items()):
            if not q.oracle:
                continue
            total += 1
            problems = compare(name, spark, sf_dir, q.builder, q.oracle)
            if problems:
                failures += 1
                print(f"FAIL {sf_dir} {name}: {problems}")
    print(f"sweep: {failures} failures of {total} checks across {len(sf_dirs)} SFs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

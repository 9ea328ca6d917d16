#!/usr/bin/env python
"""Scaling evidence: run the headline suite at sf0.001 / sf0.01 /
sf0.1 (100x input growth) and record how wall time grows. A
scale-correct plan grows sublinearly at these sizes (fixed overheads
dominate small SFs); anything growing FASTER than the input (ratio
per 10x decade > 10) is flagged as a super-linear suspect for review.

Writes SCALING.json. Run on a quiet box: python scripts/scaling_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
RUNS = 3  # best-of per (query, sf)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.registry import REGISTRY, headline_queries

    REGISTRY["doc_count"].builder(spark, SF_DIRS[0]).collect()  # warm-up

    out: dict = {"sf_dirs": SF_DIRS, "runs": RUNS, "queries": {}}
    suspects = []
    for q in headline_queries():
        times = []
        for sf_dir in SF_DIRS:
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.perf_counter()
                q.builder(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            times.append(round(best, 3))
        # growth per 10x input decade, geometric mean of the two steps
        decade = (times[2] / times[0]) ** 0.5 if times[0] > 0 else None
        rec = {
            "sec": times,
            "growth_per_10x": round(decade, 2) if decade else None,
        }
        if decade and decade > 10:
            rec["flag"] = "super-linear"
            suspects.append(q.name)
        out["queries"][q.name] = rec
    out["super_linear"] = suspects
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote SCALING.json; super-linear suspects: {suspects or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Incremental oracle sweep: run the named queries at the given SFs
and merge their results into the committed SWEEP.json (created by
scripts/sweep.py). Used to extend a full sweep with late-added
queries without re-running the whole registry.

Usage: python scripts/sweep_delta.py q1 [q2 ...] -- sf_dir [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    argv = sys.argv[1:]
    split = argv.index("--")
    names, sf_dirs = argv[:split], argv[split + 1 :]

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.registry import REGISTRY
    from tests.oracle import compare

    path = os.path.join(os.path.dirname(__file__), "..", "SWEEP.json")
    with open(path) as fh:
        out = json.load(fh)

    failures = 0
    for sf_dir in sf_dirs:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        for name in names:
            q = REGISTRY[name]
            if not q.oracle:
                out["queries"].setdefault(name, {})[sf_key] = "no-oracle"
                continue
            problems = compare(name, spark, sf_dir, q.builder, q.oracle)
            out["queries"].setdefault(name, {})[sf_key] = problems or "ok"
            if problems:
                failures += 1
                print(f"FAIL {sf_dir} {name}: {problems}")

    out["queries"] = dict(sorted(out["queries"].items()))
    # recompute the headline counters from the merged entry map — a
    # re-run that turns a red entry green must also retire its failure
    out["checks"] = sum(
        1
        for per_sf in out["queries"].values()
        for v in per_sf.values()
        if v != "no-oracle"
    )
    out["failures"] = sum(
        1
        for per_sf in out["queries"].values()
        for v in per_sf.values()
        if v not in ("ok", "no-oracle")
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, default=str)
    print(f"delta sweep: {failures} failures; SWEEP.json now {out['checks']} checks")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

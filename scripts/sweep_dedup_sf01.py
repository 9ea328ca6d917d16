#!/usr/bin/env python
"""Targeted sf0.1 oracle-parity sweep for the dedup family (SURVEY §5
policy: the exact all-pairs DuckDB oracles are the expensive side —
the engine's LSH path is fast — so these re-runs are batched per
round instead of riding the default sweep).

Writes DEDUP_SF01.json INCREMENTALLY (after every query) so partial
progress survives interruption. DuckDB is capped at 10 threads and
Spark at local[8] to leave the machine usable while this runs.

Run: python scripts/sweep_dedup_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "DEDUP_SF01.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("dedup-sf01").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import tests.oracle as O

    _orig_conn = O.duckdb_conn

    def capped_conn(d):
        con = _orig_conn(d)
        con.execute("SET threads = 10")
        return con

    O.duckdb_conn = capped_conn

    from email_etl_spark.plans.registry import REGISTRY

    fam = sorted(
        n
        for n in REGISTRY
        if n.startswith(("dedup_", "dup_", "minhash_", "lsh_", "simhash_"))
        or n
        in (
            "near_dup_rate_curve",
            "semdedup_prune",
            "incremental_neardup",
            "winnowing_dedup",
            "content_chunk_dedup",
            "prefix_dup_rate",
            "graph_triangles",
            "cross_lang_pairs",
        )
    )
    # cheapest oracles first (non-pair rollups), all-pairs scans last,
    # so an interrupted run still covers most of the family
    light = [n for n in fam if "minhash" not in n and "jaccard" not in n]
    heavy = [n for n in fam if n not in light]
    ordered = light + heavy

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("results", {})

    git_head = os.popen("git -C /root/repo rev-parse --short HEAD").read().strip()
    failures = 0
    for name in ordered:
        if results.get(name, {}).get("head") == git_head:
            continue  # already recorded at this HEAD
        q = REGISTRY[name]
        if not q.oracle:
            results[name] = {"head": git_head, "status": "no-oracle"}
        else:
            t0 = time.time()
            try:
                problems = O.compare(name, spark, sf_dir, q.builder, q.oracle)
                status = "ok" if not problems else "FAIL: " + "; ".join(problems)
            except Exception as exc:  # noqa: BLE001
                status = f"ERROR: {exc}"
            if not status == "ok":
                failures += 1
            results[name] = {
                "head": git_head,
                "status": status,
                "secs": round(time.time() - t0, 1),
            }
        with open(OUT, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_done": len(results), "results": results},
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"{name}: {results[name].get('status')}", flush=True)
    print(f"dedup sf0.1 sweep: {failures} failures of {len(ordered)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Targeted sf0.1 oracle-parity sweep for the dedup family (SURVEY §5
policy: the exact all-pairs DuckDB oracles are the expensive side —
the engine's LSH path is fast — so these re-runs are batched per
round instead of riding the default sweep).

Writes DEDUP_SF01.json INCREMENTALLY (after every query) so partial
progress survives interruption. The Spark side runs in-process; each
ORACLE runs in a worker subprocess with a hard timeout, because one
recursive-closure CTE over an all-pairs graph can otherwise starve
the whole family (observed: dedup_clusters' reachability CTE ran
>45 min at sf0.1). Queries are ordered cheap -> pair-scan ->
recursive-closure so coverage accrues fastest.

Run: python scripts/sweep_dedup_sf01.py [sf_dir] [per_oracle_timeout_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "DEDUP_SF01.json")

# recursive transitive-closure oracles: run LAST, most likely to time out
_CLOSURE = (
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_savings",
    "dup_cluster_size_hist",
)
# cheap non-pair rollups first
_CHEAP = (
    "dedup_exact",
    "dup_rate_by_source",
    "prefix_dup_rate",
    "lsh_bucket_skew",
    "minhash_index_integrity",
    "content_chunk_dedup",
    "dedup_tiers",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    per_to = int(sys.argv[2]) if len(sys.argv) > 2 else 2400

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("dedup-sf01").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.registry import REGISTRY
    from tests.oracle import canonical_rows, column_hashes, run_spark

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
            "cross_source_dup_matrix",
            "closure_edge_stats",
        )
    )
    ordered = (
        [n for n in _CHEAP if n in fam]
        + [n for n in fam if n not in _CHEAP and n not in _CLOSURE]
        + [n for n in _CLOSURE if n in fam]
    )

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("results", {})

    git_head = os.popen("git -C /root/repo rev-parse --short HEAD").read().strip()

    def flush() -> None:
        with open(OUT, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_done": len(results), "results": results},
                f,
                indent=1,
                sort_keys=True,
            )

    from sweep_late_sf01 import query_fingerprint, run_oracle_with_timeout

    failures = 0
    for name in ordered:
        q = REGISTRY[name]
        fp = query_fingerprint(q)
        prior = results.get(name, {})
        if (
            name in results
            and not prior["status"].startswith("oracle-timeout")
            and prior.get("fingerprint") == fp
        ):
            continue  # recorded for the SAME query identity
        t0 = time.time()
        s_cols, s_rows = [], []
        try:
            s_cols, s_rows = run_spark(q.builder, spark, sf_dir)
            kind, payload = run_oracle_with_timeout(q.oracle, sf_dir, per_to)
            if kind == "timeout":
                results[name] = {
                    "head": git_head,
                    "fingerprint": fp,
                    "status": f"oracle-timeout(>{per_to}s; engine side OK,"
                    f" {len(s_rows)} rows)",
                    "secs": round(time.time() - t0, 1),
                }
                flush()
                print(f"{name}: oracle-timeout", flush=True)
                continue
            o_cols, o_rows = payload
            problems = []
            if sorted(s_cols) != sorted(o_cols):
                problems.append("columns differ")
            if len(s_rows) != len(o_rows):
                problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
            elif canonical_rows(s_cols, s_rows) != canonical_rows(o_cols, o_rows):
                sh, oh = column_hashes(s_cols, s_rows), column_hashes(o_cols, o_rows)
                bad = sorted(c for c in sh if sh[c] != oh.get(c))
                problems.append(f"values differ in columns {bad}")
            status = "ok" if not problems else "FAIL: " + "; ".join(problems)
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR: {exc}"
        if status != "ok":
            failures += 1
        results[name] = {
            "head": git_head,
            "fingerprint": fp,
            "status": status,
            "secs": round(time.time() - t0, 1),
            # per-output-column hashes (VERDICT r9 #5): a future red
            # names its divergent column by diffing these
            "col_hashes": column_hashes(s_cols, s_rows),
        }
        flush()
        print(f"{name}: {status} ({results[name]['secs']}s)", flush=True)
    print(f"dedup sf0.1 sweep: {failures} non-ok of {len(ordered)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

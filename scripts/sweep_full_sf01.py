#!/usr/bin/env python
"""Full-registry sf0.1 oracle-parity sweep (VERDICT r8 #7): extend the
sf0.1 evidence beyond LATE_SF01.json (the never-driver-sampled batch)
and DEDUP_SF01.json (the dedup family) to EVERY remaining registry
query — the TPC-H family and the older §A-§D surface had only
sf0.001/sf0.01 records.

Queries already green in LATE_SF01.json or DEDUP_SF01.json (same
query fingerprint) are skipped here — this record is the complement,
written to FULL_SF01.json incrementally with the same
fingerprint-reuse and subprocess-timeout discipline as the other two.

Run: python scripts/sweep_full_sf01.py [sf_dir] [per_oracle_timeout_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from sweep_late_sf01 import query_fingerprint, run_oracle_with_timeout  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "FULL_SF01.json")


def _covered_elsewhere() -> set[str]:
    """Names green at sf0.1 in the other committed records — trusted
    ONLY when the recorded fingerprint matches the current query
    (legacy rows without fingerprints don't exempt a query: a stale
    green row once hid the fixed ks_uniform_hour from this sweep)."""
    from email_etl_spark.plans import REGISTRY

    done: set[str] = set()
    for fname in ("LATE_SF01.json", "DEDUP_SF01.json"):
        path = os.path.join(ROOT, fname)
        if not os.path.exists(path):
            continue
        for name, row in json.load(open(path)).get("results", {}).items():
            if (
                row.get("status") == "ok"
                and name in REGISTRY
                and row.get("fingerprint") == query_fingerprint(REGISTRY[name])
            ):
                done.add(name)
    return done


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    per_to = int(sys.argv[2]) if len(sys.argv) > 2 else 1200

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("full-sf01").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans import REGISTRY
    from tests.oracle import canonical_rows, column_hashes, run_spark

    covered = _covered_elsewhere()
    # the dedup family is DEDUP_SF01's domain (sweep_dedup_sf01.py owns
    # its expensive all-pairs oracles) — exclude it here even when its
    # rows are mid-refresh, so a concurrent family re-record is never
    # duplicated into this sweep (observed: dedup_minhash ran twice,
    # ~920 s wasted)
    dedup_domain = {
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
    }
    todo = [
        n
        for n in REGISTRY
        if n not in covered and n not in dedup_domain and REGISTRY[n].oracle
    ]

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("results", {})
    # prune any dedup-domain rows a previous (pre-exclusion) run left
    # here — their sf0.1 evidence lives in DEDUP_SF01.json
    results = {k: v for k, v in results.items() if k not in dedup_domain}
    git_head = os.popen(f"git -C {ROOT} rev-parse --short HEAD").read().strip()

    def flush() -> None:
        with open(OUT, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "covered_elsewhere": len(covered),
                    "n_done": len(results),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )

    failures = 0
    for name in todo:
        q = REGISTRY[name]
        fp = query_fingerprint(q)
        prior = results.get(name, {})
        if prior.get("status") == "ok" and prior.get("fingerprint") == fp:
            continue
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
    print(f"full-registry sf0.1 sweep: {failures} non-ok of {len(todo)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

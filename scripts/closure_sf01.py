#!/usr/bin/env python
"""sf0.1 parity for the transitive-CLOSURE dedup consumers
(dedup_clusters / dedup_keep_best / dedup_savings /
dup_cluster_size_hist) against an EQUIVALENT exact oracle that scales:

The registered oracles compute the closure with a recursive
reachability CTE — exact, but O(V·E) in DuckDB and pathological at
sf0.1 (>45 min observed before any row). The closure itself is not
the hard part: the exact ALL-PAIRS Jaccard scan is. So this harness
runs THAT part in DuckDB once (shared across all four queries),
derives the closure with a Python union-find (milliseconds), rebuilds
each query's expected output from the exact components + per-doc
DuckDB facts (quality / token counts), and compares against the Spark
results with the same canonical-row convention as tests/oracle.py.

Writes DEDUP_CLOSURE_SF01.json. Run: python scripts/closure_sf01.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "DEDUP_CLOSURE_SF01.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from email_etl_spark.plans.dedup import (
        MINHASH_THRESHOLD,
        _pairs_sql,
        _quality_sql_fragment,
        _shingle_cte,
    )
    from email_etl_spark.plans.text import _TOKS

    con = duckdb.connect()
    con.execute("SET threads = 10")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )

    t0 = time.time()
    pairs = con.execute(
        f"WITH {_shingle_cte(3)} {_pairs_sql(MINHASH_THRESHOLD)}"
    ).fetchall()
    t_pairs = round(time.time() - t0, 1)
    print(f"exact all-pairs scan: {len(pairs)} pairs in {t_pairs}s", flush=True)

    # union-find closure (min-label components)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, int] = {d: find(d) for d in parent}
    # normalize to min member id per component
    members: dict[int, list[int]] = {}
    for d, r in comp.items():
        members.setdefault(r, []).append(d)
    cluster_of = {
        d: min(ms) for r, ms in members.items() for d in ms
    }

    quality = dict(
        con.execute(
            f"SELECT doc_id, {_quality_sql_fragment()} FROM documents"
        ).fetchall()
    )
    ntok = dict(
        con.execute(f"SELECT doc_id, len({_TOKS}) FROM documents").fetchall()
    )
    corpus_tokens = sum(ntok.values())

    # expected outputs per query (mirrors the registered oracle SQL)
    clusters = sorted(cluster_of.items())  # (doc_id, cluster_id)

    sizes: dict[int, int] = {}
    for _, cid in clusters:
        sizes[cid] = sizes.get(cid, 0) + 1
    hist: dict[int, int] = {}
    for n in sizes.values():
        hist[n] = hist.get(n, 0) + 1
    size_hist = sorted((k, v, k * v) for k, v in hist.items())

    keep_best = []
    by_cluster: dict[int, list[int]] = {}
    for d, cid in clusters:
        by_cluster.setdefault(cid, []).append(d)
    for cid, ms in sorted(by_cluster.items()):
        best = sorted(ms, key=lambda d: (-quality[d], d))[0]
        keep_best.append((cid, best, len(ms), quality[best]))

    n_clusters = len(by_cluster)
    n_docs_in = sum(len(ms) for ms in by_cluster.values())
    tokens_removable = sum(
        sum(ntok[d] for d in ms) - ntok[min(ms)] for ms in by_cluster.values()
    )
    savings = (
        n_clusters,
        n_docs_in,
        n_docs_in - n_clusters,
        tokens_removable,
        tokens_removable * 10000 // corpus_tokens,
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]").appName("closure-sf01").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from email_etl_spark.plans.registry import REGISTRY
    from tests.oracle import canonical_rows

    git_head = os.popen("git -C /root/repo rev-parse --short HEAD").read().strip()
    results: dict[str, dict] = {}

    def check(name: str, expected: list[tuple], cols: list[str]) -> None:
        t1 = time.time()
        df = REGISTRY[name].builder(spark, sf_dir)
        got_cols, got = df.columns, [tuple(r) for r in df.collect()]
        ok = (
            sorted(got_cols) == sorted(cols)
            and len(got) == len(expected)
            and canonical_rows(got_cols, got) == canonical_rows(cols, expected)
        )
        results[name] = {
            "head": git_head,
            "status": "ok" if ok else "FAIL",
            "n_rows": len(got),
            "secs": round(time.time() - t1, 1),
            "oracle": "exact all-pairs (DuckDB) + union-find closure (Python)",
        }
        print(f"{name}: {results[name]['status']} ({len(got)} rows)", flush=True)

    check("dedup_clusters", clusters, ["doc_id", "cluster_id"])
    check(
        "dup_cluster_size_hist",
        [(a, b, c) for a, b, c in size_hist],
        ["cluster_size", "n_clusters", "n_docs"],
    )
    check(
        "dedup_keep_best",
        keep_best,
        ["cluster_id", "keep_doc_id", "n_members", "best_quality"],
    )
    check(
        "dedup_savings",
        [savings],
        [
            "n_clusters",
            "n_docs_in_clusters",
            "n_docs_removable",
            "tokens_removable",
            "corpus_tokens_bps",
        ],
    )

    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "pairs_scan_secs": t_pairs,
                "n_exact_pairs": len(pairs),
                "results": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    bad = [k for k, v in results.items() if v["status"] != "ok"]
    print(f"closure sf0.1: {len(bad)} failures {bad or ''}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Targeted sf0.1 oracle-parity sweep for the round-7 late batch —
the ~90 queries that had only sf0.001/sf0.01 sweep evidence (VERDICT
r7 #4). sf0.1 is the SF where docs-without-embeddings exist, the
exact class where the r3 advisor found a latent ranking-universe bug,
so the documents⋈embeddings rankers (knn_confusion, silhouette /
davies-bouldin / calinski, embedding_isotropy, the pca_* family) run
FIRST; the rest follow in registration order.

Writes LATE_SF01.json INCREMENTALLY (after every query) so partial
progress survives interruption; each oracle runs in a worker
subprocess with a hard timeout.

Reuse policy (ADVICE r8): a green row is reused ONLY while its
recorded query FINGERPRINT (sha256 of the builder source + oracle
SQL) matches the current registry — a query whose code or oracle
changed since the row was recorded always re-runs, so the artifact
can never silently mix result contracts across heads. (Fingerprints
don't see shared-helper internals; the 2-SF full sweep covers those.)

Run: python scripts/sweep_late_sf01.py [sf_dir] [per_oracle_timeout_s]
"""

from __future__ import annotations

import hashlib
import inspect
import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "LATE_SF01.json")

# documents⋈embeddings ranking universe first (the risk class at sf0.1)
_PRIORITY = (
    "knn_confusion",
    "silhouette_centroid",
    "davies_bouldin",
    "calinski_harabasz",
    "embedding_isotropy",
    "pca_top2_loadings",
    "pca_explained_variance",
    "pca_projection_hist",
    "hub_vectors",
    "int8_quant_report",
    "linear_probe",
    "cluster_source_span",
    "ann_ivfpq",
)


def _late_batch() -> list[str]:
    """The never-driver-sampled set = union of CORRECTNESS_r*.json keys
    complemented against the registry (the same definition VERDICT
    uses for the backlog)."""
    import glob

    from email_etl_spark.plans.registry import REGISTRY

    sampled: set[str] = set()
    root = os.path.join(os.path.dirname(__file__), "..")
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        sampled |= set(json.load(open(f)).keys())
    return [n for n in REGISTRY if n not in sampled]


def query_fingerprint(q) -> str:
    """sha256 over the builder source + oracle SQL: the identity a
    recorded green row is valid for."""
    src = inspect.getsource(q.builder)
    return hashlib.sha256((src + (q.oracle or "")).encode()).hexdigest()[:16]


def _oracle_worker(sql: str, sf_dir: str, out: "mp.Queue") -> None:
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tests.oracle import run_oracle

        out.put(("ok", run_oracle(sql, sf_dir)))
    except Exception as exc:  # noqa: BLE001 — report, don't hang
        out.put(("err", repr(exc)))


def run_oracle_with_timeout(sql: str, sf_dir: str, timeout_s: int):
    """('ok', (cols, rows)) | ('timeout', None); raises on oracle
    error. A timed-out worker is terminate()d via its own Process
    handle — no executor private API. fork context: the worker only
    runs DuckDB (no JVM state crosses the fork), and fork avoids
    spawn's __main__ re-import."""
    ctx = mp.get_context("fork")
    out: mp.Queue = ctx.Queue()
    p = ctx.Process(target=_oracle_worker, args=(sql, sf_dir, out), daemon=True)
    p.start()
    try:
        kind, payload = out.get(timeout=timeout_s)
    except queue_mod.Empty:
        p.terminate()
        p.join(10)
        return ("timeout", None)
    p.join(10)
    if kind == "err":
        raise RuntimeError(payload)
    return ("ok", payload)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    per_to = int(sys.argv[2]) if len(sys.argv) > 2 else 1200

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("late-sf01").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from email_etl_spark.plans.registry import REGISTRY
    from tests.oracle import canonical_rows, column_hashes, run_spark

    batch = _late_batch()
    # the dedup family is DEDUP_SF01's domain (sweep_dedup_sf01.py owns
    # its expensive all-pairs oracles) — never duplicate them here even
    # when they are in the never-sampled batch
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
    batch = [n for n in batch if n not in dedup_domain]
    ordered = [n for n in _PRIORITY if n in batch] + [
        n for n in batch if n not in _PRIORITY
    ]

    results: dict[str, dict] = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT)).get("results", {})
    results = {k: v for k, v in results.items() if k not in dedup_domain}

    git_head = os.popen("git -C /root/repo rev-parse --short HEAD").read().strip()

    def flush() -> None:
        with open(OUT, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_done": len(results), "results": results},
                f,
                indent=1,
                sort_keys=True,
            )

    failures = 0
    for name in ordered:
        q = REGISTRY[name]
        fp = query_fingerprint(q)
        prior = results.get(name, {})
        # reuse green rows ONLY for the same query identity;
        # FAIL/ERROR/timeout rows always retry so a fix is recleared
        if prior.get("status") == "ok":
            if prior.get("fingerprint") == fp:
                continue
            print(f"{name}: green row is for a changed query — re-running", flush=True)
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
    print(f"late-batch sf0.1 sweep: {failures} non-ok of {len(ordered)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Persisted full-text postings index (SURVEY §2.C): the inverted
file is built once, term-bucketed, and queries against it are
PARTITION-PRUNED bucket reads — the GIN-index discipline of the
reference (scripts/init_db.sql:59-67) re-expressed as a parquet
layout."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _scan_plan(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_text_index_query_is_partition_pruned(spark, tmp_path):
    from email_etl_spark.plans.search import (
        QUERY_TERMS,
        _term_bucket,
        build_text_index,
    )

    index_dir = build_text_index(spark, SF_SMOKE, str(tmp_path / "text_idx"))
    postings_dir = os.path.join(index_dir, "postings")
    assert os.path.exists(os.path.join(postings_dir, "_SUCCESS"))
    assert os.path.exists(os.path.join(index_dir, "stats", "_SUCCESS"))

    buckets = sorted({_term_bucket(t) for t in QUERY_TERMS})
    idx = spark.read.parquet(postings_dir)
    pruned = idx.where(
        F.col("tb").isin(buckets) & F.col("term").isin(list(QUERY_TERMS))
    )

    # the bucket predicate must land in PartitionFilters (directory
    # pruning), with the term filter pushed to the row group scan
    plan = _scan_plan(pruned)
    scan = plan[plan.index("Scan parquet") :]
    pf = next(
        ln for ln in scan.splitlines() if ln.strip().startswith("PartitionFilters")
    )
    assert "tb#" in pf, pf
    pushed = next(
        ln for ln in scan.splitlines() if ln.strip().startswith("PushedFilters")
    )
    assert "term" in pushed, pushed

    # and the pruning is real: every file the executed scan touches
    # lives in a query-term bucket directory
    all_dirs = {
        os.path.basename(d)
        for d in glob.glob(os.path.join(postings_dir, "tb=*"))
    }
    assert len(all_dirs) > len(buckets)  # index has more buckets than the query needs
    read_files = [
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    for f in read_files:
        assert any(f"/tb={b}/" in f for b in buckets), f


def test_bm25_indexed_matches_scan_path(spark):
    """The indexed read must reproduce the from-scratch bm25_search
    exactly — same scoring op tree over persisted integers."""
    from email_etl_spark.plans.search import bm25_indexed, bm25_search

    a = [tuple(r) for r in bm25_search(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in bm25_indexed(spark, SF_SMOKE).collect()]
    assert a == b

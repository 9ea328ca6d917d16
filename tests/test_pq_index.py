"""Persisted IVF+PQ index (SURVEY §2.F): the code table is built once
partitioned by IVF list (ccid); probing must be a PARTITION-PRUNED
read of only the probed list directories — the build-once serving
discipline of the reference's HNSW index (scripts/init_db.sql:53),
composed with PQ's 32x code compression."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan_string(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_pq_index_layout_and_pruning(spark, tmp_path):
    from email_etl_spark.plans.search import IVF_K, PQ_M, build_pq_index

    index_dir = build_pq_index(spark, SF_SMOKE, str(tmp_path / "pq_idx"))
    codes_dir = os.path.join(index_dir, "codes")
    book_dir = os.path.join(index_dir, "codebook")
    assert os.path.exists(os.path.join(codes_dir, "_SUCCESS"))
    assert os.path.exists(os.path.join(book_dir, "_SUCCESS"))

    # layout: one directory per IVF list; codebook has PQ_M * K rows
    list_dirs = [d for d in os.listdir(codes_dir) if d.startswith("ccid=")]
    assert 1 < len(list_dirs) <= IVF_K
    book = spark.read.parquet(book_dir)
    assert book.count() <= PQ_M * 8
    assert set(book.columns) == {"m", "cid", "cv"}

    # a probe read must prune at the directory level
    idx = spark.read.parquet(codes_dir)
    probed = [0, 3]
    filtered = idx.where(F.col("ccid").cast("int").isin(probed))
    plan = _plan_string(filtered)
    scan = plan[plan.index("Scan parquet") :]
    pf = next(
        ln for ln in scan.splitlines() if ln.strip().startswith("PartitionFilters")
    )
    assert "ccid" in pf, pf

    total_files = len(glob.glob(os.path.join(codes_dir, "ccid=*", "*.parquet")))
    read_files = [
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    ]
    assert 0 < len(read_files) < total_files, (len(read_files), total_files)
    for f in read_files:
        assert any(f"ccid={c}/" in f for c in probed), f


def test_indexed_ivfpq_matches_inline(spark):
    """ann_ivfpq_indexed must return exactly ann_ivfpq's results — the
    persisted index is a layout/amortization change only."""
    from email_etl_spark.plans.registry import REGISTRY

    inline = REGISTRY["ann_ivfpq"].builder(spark, SF_SMOKE).collect()
    indexed = REGISTRY["ann_ivfpq_indexed"].builder(spark, SF_SMOKE).collect()
    assert [r.asDict() for r in inline] == [r.asDict() for r in indexed]

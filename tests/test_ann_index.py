"""Persisted ANN index (SURVEY §2.F): the bucket table is built once,
and queries against it are PARTITION-PRUNED bucket reads — the scan
must touch only the query's (t, key) directories, never the corpus
(the build-once index discipline of the reference's HNSW,
scripts/init_db.sql:53)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _scan_section(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_index_query_is_partition_pruned(spark, tmp_path):
    from email_etl_spark.plans.search import (
        _query_bucket_keys,
        _qvec_list,
        build_ann_index,
    )

    index_dir = build_ann_index(spark, SF_SMOKE, str(tmp_path / "ann_idx"))
    assert os.path.exists(os.path.join(index_dir, "_SUCCESS"))
    # layout: one directory per (t, key) bucket
    t_dirs = [d for d in os.listdir(index_dir) if d.startswith("t=")]
    assert sorted(t_dirs) == [f"t={t}" for t in range(4)]

    keys = _query_bucket_keys(_qvec_list(spark, SF_SMOKE))
    idx = spark.read.parquet(index_dir)
    pred = None
    for t, key in keys:
        clause = (F.col("t") == t) & (F.col("key") == key)
        pred = clause if pred is None else (pred | clause)
    filtered = idx.where(pred)

    # the predicate must land in the scan's PartitionFilters (directory
    # pruning), not a post-scan Filter over the full index
    plan = _scan_section(filtered)
    scan = plan[plan.index("Scan parquet") :]
    pf = next(
        ln for ln in scan.splitlines() if ln.strip().startswith("PartitionFilters")
    )
    assert "t#" in pf and "key#" in pf, pf

    # and the pruning is real: the files the executed scan actually
    # touches (input_file_name over the pruned read) all live in the
    # query's bucket directories — 4 dirs out of hundreds
    import glob

    total_files = len(glob.glob(os.path.join(index_dir, "t=*", "key=*", "*.parquet")))
    read_files = [
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    ]
    want_dirs = {f"t={t}/key={k}" for t, k in keys}
    assert 0 < len(read_files) < total_files, (len(read_files), total_files)
    for f in read_files:
        assert any(d in f for d in want_dirs), f


def test_indexed_ann_matches_inline_ann(spark):
    """ann_lsh_indexed must return exactly ann_lsh's results — same
    buckets, same verification, the index is a layout change only."""
    from email_etl_spark.plans.registry import REGISTRY

    inline = REGISTRY["ann_lsh"].builder(spark, SF_SMOKE).collect()
    indexed = REGISTRY["ann_lsh_indexed"].builder(spark, SF_SMOKE).collect()
    assert [r.asDict() for r in inline] == [r.asDict() for r in indexed]

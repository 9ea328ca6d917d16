"""Streaming text-index maintenance: epoch-keyed idempotent deltas,
base ∪ delta reads, additive stats, crash-safe compaction
(SURVEY §2.C/§2.H)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from email_etl_spark.streaming.text_index import (
    _postings,
    _stats,
    compact_text_index,
    read_text_postings,
    read_text_stats,
    run_text_index_stream,
)
from tests.conftest import SF_SMOKE


def _drop_docs(spark, src_dir: str, doc_ids, name: str) -> None:
    from email_etl_spark.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("doc_id").isin(list(doc_ids))
    )
    stage = os.path.join(src_dir, f"_stage_{name}")
    docs.select("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(stage)


def _stream(spark, src_dir):
    from email_etl_spark.io import load_table

    schema = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").schema
    return spark.readStream.schema(schema).parquet(src_dir)


def test_stream_deltas_compact_and_serve(spark, tmp_path):
    src = str(tmp_path / "docs")
    root = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _drop_docs(spark, src, [0, 1, 2], "d1")
    run_text_index_stream(_stream(spark, src), root, ck)
    assert os.path.isdir(os.path.join(root, "_deltas"))

    from email_etl_spark.io import load_table

    batch = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 3)
    expect_post = {
        (r.term, r.doc_id, r.tf, r.dl, r.tb)
        for r in _postings(batch.select("doc_id", "text")).collect()
    }
    got = read_text_postings(spark, root)
    assert {
        (r.term, r.doc_id, r.tf, r.dl, r.tb) for r in got.collect()
    } == expect_post
    expect_stats = _stats(batch.select("doc_id", "text")).collect()[0]
    got_stats = read_text_stats(spark, root).collect()[0]
    assert (got_stats.n_total, got_stats.sum_dl) == (
        expect_stats.n_total,
        expect_stats.sum_dl,
    )

    # second drop, then compact: base becomes tb-partitioned, stats
    # collapse to one row, deltas cleared, contents preserved
    _drop_docs(spark, src, [3, 4], "d2")
    run_text_index_stream(_stream(spark, src), root, ck)
    compact_text_index(spark, root)
    base = os.path.join(root, "base")
    assert any(
        d.startswith("tb=") for d in os.listdir(os.path.join(base, "postings"))
    )
    assert not os.path.isdir(os.path.join(root, "_deltas"))
    after_stats = read_text_stats(spark, root).collect()[0]
    assert after_stats.n_total == 5
    assert {
        r.doc_id for r in read_text_postings(spark, root).select("doc_id").distinct().collect()
    } == {0, 1, 2, 3, 4}


def test_epoch_overwrite_is_idempotent(spark, tmp_path):
    """A retried epoch rewrites its own directory — postings AND the
    additive stats row — instead of double-counting."""
    src = str(tmp_path / "docs")
    root = str(tmp_path / "index")
    os.makedirs(src)
    _drop_docs(spark, src, [0, 1], "d1")
    batch = spark.read.parquet(src)
    ep = os.path.join(root, "_deltas", "epoch=0")
    for _ in range(2):  # the retry
        _postings(batch).write.mode("overwrite").parquet(os.path.join(ep, "postings"))
        _stats(batch).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ep, "stats")
        )
    assert read_text_stats(spark, root).collect()[0].n_total == 2
    n_docs = (
        read_text_postings(spark, root).select("doc_id").distinct().count()
    )
    assert n_docs == 2


def test_compact_recovers_interrupted_swap(spark, tmp_path):
    src = str(tmp_path / "docs")
    root = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    _drop_docs(spark, src, [0, 1], "d1")
    run_text_index_stream(_stream(spark, src), root, ck)
    compact_text_index(spark, root)
    base = os.path.join(root, "base")
    # simulate a crash between rename(base->old) and rename(tmp->base)
    shutil.move(base, base + ".old")
    compact_text_index(spark, root)
    assert os.path.isdir(base) and not os.path.isdir(base + ".old")
    assert read_text_stats(spark, root).collect()[0].n_total == 2

"""Online near-dup screening against the persisted MinHash index
(SURVEY §2.E/§2.H): copies of corpus docs must be flagged with their
keeper, novel docs must pass, batch cost ~ candidates not corpus."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.dedup import build_minhash_index
from email_etl_spark.streaming.neardup import run_neardup_stream, screen_batch
from tests.conftest import SF_SMOKE


def _corpus(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_screen_batch_flags_copies_and_admits_novel(spark, tmp_path):
    index_dir = build_minhash_index(spark, SF_SMOKE, str(tmp_path / "mh_idx"))
    index = spark.read.parquet(index_dir)
    corpus = _corpus(spark)
    # batch: verbatim copy of doc 3, copy of doc 7, one novel doc
    src = {r.doc_id: r.text for r in corpus.where(F.col("doc_id").isin(3, 7)).collect()}
    batch = spark.createDataFrame(
        [
            (100001, src[3]),
            (100002, src[7]),
            (100003, "entirely novel zebra xylophone contraption manifesto"),
        ],
        "doc_id long, text string",
    )
    got = screen_batch(batch, index, corpus, threshold=0.6).collect()
    flagged = {r.new_id for r in got}
    assert 100001 in flagged and 100002 in flagged
    assert 100003 not in flagged
    exact = {r.new_id: r for r in got if r.dup_of in (3, 7)}
    assert exact[100001].j_bps == 10000 and exact[100001].dup_of == 3
    assert exact[100002].j_bps == 10000 and exact[100002].dup_of == 7


def test_run_neardup_stream_end_to_end(spark, tmp_path):
    index_dir = build_minhash_index(spark, SF_SMOKE, str(tmp_path / "mh_idx"))
    corpus = _corpus(spark)
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    doc3 = corpus.where(F.col("doc_id") == 3).first().text
    drop = spark.createDataFrame(
        [(200001, doc3), (200002, "novel wombat accordion parliament")],
        "doc_id long, text string",
    )
    stage = os.path.join(src_dir, "_stage")
    drop.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(src_dir, "d1.parquet"))
    shutil.rmtree(stage)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    out = str(tmp_path / "verdicts")
    run_neardup_stream(
        stream, index_dir, corpus, out, str(tmp_path / "ck"), threshold=0.6
    )
    got = spark.read.parquet(out).collect()
    assert {r.new_id for r in got} == {200001}
    assert any(r.dup_of == 3 and r.j_bps == 10000 for r in got)

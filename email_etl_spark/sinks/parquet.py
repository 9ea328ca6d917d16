"""Partitioned parquet warehouse writer (SURVEY §4 layout rules).

The load-side twin of io.py: writes a corpus table with the layout
that keeps 100 TB queryable —

- partition columns for pruning (date buckets for streams, source for
  corpora);
- sortWithinPartitions on the primary filter key so parquet row-group
  min/max statistics actually prune;
- target file sizing via repartition-by-bytes (small-file storms kill
  NameNode/S3 listing; giant files kill task parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 256 << 20
# conservative on-disk estimate when the input size is unknowable
# (post-transform frames): rows x avg-row-bytes x parquet ratio
DEFAULT_ROW_BYTES = 200


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_col: str | None = None,
    approx_row_bytes: int = DEFAULT_ROW_BYTES,
    mode: str = "overwrite",
) -> None:
    n_rows = df.count()
    n_files = max(1, (n_rows * approx_row_bytes) // TARGET_FILE_BYTES + 1)
    out = df.repartition(int(n_files), *[F.col(c) for c in partition_cols])
    if sort_col:
        out = out.sortWithinPartitions(sort_col)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_events_by_day(events: DataFrame, path: str) -> None:
    """Stream-table layout: day partitions + ts-sorted row groups →
    date-range queries prune partitions AND row groups."""
    with_day = events.withColumn("day", F.to_date("ts"))
    write_partitioned(with_day, path, ["day"], sort_col="ts")

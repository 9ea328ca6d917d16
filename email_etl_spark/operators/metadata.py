"""Parquet footer metadata operators (SURVEY §4 data-skipping).

At 100 TB, scan planning happens against FOOTERS, not data: per
row-group min/max statistics decide which byte ranges a predicate can
skip before any column chunk is read. These operators surface that
layer: the driver distributes only FILE PATHS; executors open footers
with pyarrow (kilobytes per file, never the data pages) inside
mapInPandas, so a million-file lake profiles in one metadata-parallel
pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROWGROUP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("rg_idx", T.IntegerType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("stat_min", T.StringType()),
        T.StructField("stat_max", T.StringType()),
    ]
)


def parquet_rowgroup_stats(
    spark: SparkSession, paths: list[str], column: str
) -> DataFrame:
    """One row per parquet row group with the min/max statistics of
    `column` (stringified — callers cast/parse per their column type).
    Paths are distributed; footers are read executor-side."""
    files = spark.createDataFrame([(p,) for p in paths], "file string").repartition(
        min(len(paths), 32)
    )

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                md = pq.ParquetFile(path).metadata
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                ci = names[column]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    col = g.column(ci)
                    st = col.statistics
                    out.append(
                        {
                            "file": path,
                            "rg_idx": rg,
                            "n_rows": g.num_rows,
                            "total_bytes": g.total_byte_size,
                            "stat_min": None if st is None else str(st.min),
                            "stat_max": None if st is None else str(st.max),
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in ROWGROUP_STATS_SCHEMA.fields]
            )

    return files.mapInPandas(read_footers, schema=ROWGROUP_STATS_SCHEMA)


def skippable_outside_window(lo_date: str, hi_date: str):
    """Skip predicate for an INCLUSIVE [lo_date, hi_date] day window
    over stringified timestamp statistics (lexicographic compare is
    chronological for 'YYYY-MM-DD HH:MM:SS[.ffffff]' strings).

    The hi bound must be extended to the day's last representable
    instant: a bare date string sorts BEFORE every timestamp on that
    day ('2024-01-20 00:00:00' > '2024-01-20' lexicographically), so
    comparing against the bare hi would misclassify a row group whose
    min falls ON the hi day as skippable even though it overlaps the
    window. lo needs no extension (any 'lo ...' timestamp >= 'lo')."""
    from pyspark.sql import functions as F

    hi_end = hi_date + " 23:59:59.999999999"
    return ~((F.col("stat_min") <= F.lit(hi_end)) & (F.col("stat_max") >= F.lit(lo_date)))


COLUMN_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("rg_idx", T.IntegerType()),
        T.StructField("column", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("compressed_bytes", T.LongType()),
        T.StructField("uncompressed_bytes", T.LongType()),
    ]
)


def parquet_column_chunks(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per (row group, column chunk) with codec and
    compressed/uncompressed byte sizes — the layout-economics layer of
    the footer (same paths-distributed / footers-executor-side shape
    as parquet_rowgroup_stats)."""
    files = spark.createDataFrame([(p,) for p in paths], "file string").repartition(
        min(len(paths), 32)
    )

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                md = pq.ParquetFile(path).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        out.append(
                            {
                                "file": path,
                                "rg_idx": rg,
                                "column": col.path_in_schema,
                                "codec": col.compression,
                                "compressed_bytes": col.total_compressed_size,
                                "uncompressed_bytes": col.total_uncompressed_size,
                            }
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in COLUMN_CHUNK_SCHEMA.fields]
            )

    return files.mapInPandas(read_footers, schema=COLUMN_CHUNK_SCHEMA)

"""Arrow IPC (Feather v2) document source (SURVEY.md §2.D sources
family — the zero-copy interchange sibling of the parquet default).

Arrow IPC files are the landing format of in-memory pipelines (Polars
/ pandas / Ray exchanges, Flight dumps): schema-carrying, chunked,
and mmap-friendly. Spark has no native reader, so this source follows
the WARC recipe: the driver distributes FILE PATHS only, and
executors open their own files with pyarrow inside mapInPandas — one
task per file, which matches how IPC dumps shard (per-writer files).

Contract (same as the other sources):
- schema ENFORCED: files whose columns/types drift from the documents
  schema fail loudly at read, never coerce silently;
- `src_file` lineage stamped on every row;
- rows missing required fields (doc_id, text) split into a quarantine
  frame with lineage. Structural corruption of the IPC framing raises
  from pyarrow — correct for a checksummed binary format.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_ARROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("src_file", T.StringType()),
    ]
)

_EXPECTED_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def read_documents_arrow(
    spark: SparkSession, paths: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Read Arrow IPC (Feather) document shards.

    Returns (good, quarantine): good rows have non-null doc_id and
    text; quarantine carries rows missing required fields, with
    `src_file` lineage on both sides.
    """
    files = spark.createDataFrame([(p,) for p in paths], "file string").repartition(
        min(len(paths), 32)
    )

    def read_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.feather as feather

        for pdf in batches:
            for path in pdf["file"]:
                tbl = feather.read_table(path)
                got = tbl.column_names
                if got != _EXPECTED_COLS:
                    raise ValueError(
                        f"{path}: schema drift — expected {_EXPECTED_COLS}, got {got}"
                    )
                out = tbl.to_pandas()
                out["src_file"] = path
                yield out

    raw = files.mapInPandas(read_shards, schema=DOCUMENTS_ARROW_SCHEMA)
    ok = F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    return raw.where(ok), raw.where(~ok)

"""ORC document source (SURVEY.md §2.D sources family — the columnar
sibling of the parquet default).

Hive-era lakes and Trino/Presto deployments land large corpora as ORC;
a drop-in engine must read them without a conversion pass. Spark's
native ORC reader (`spark.read.orc`) gives the same columnar
properties the parquet path relies on — predicate pushdown into
stripe/row-group indexes, column pruning, splittable stripes — so the
100 TB contract is identical: declare the schema, let the scan prune.

Contract (same as the other sources):
- schema ENFORCED up front, never inferred per shard: a shard whose
  column type drifted fails loudly at read, not silently at query;
- `src_file` lineage stamped on every row;
- rows missing required fields (doc_id, text) are split into a
  quarantine frame with lineage — ORC is binary so there is no
  corrupt-LINE notion like CSV/JSONL; structural corruption fails the
  stripe read loudly, which is the correct behavior for a checksummed
  columnar format.

Reference surface: bulk archive ingestion generalized (ref: mbox bulk
path, src/email_parser.py:37-85) to warehouse-native columnar drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_ORC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_orc(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read an ORC documents corpus with the fixed schema.

    Returns (good, quarantine): good rows have non-null doc_id and
    text; quarantine carries rows missing required fields, with
    `src_file` lineage on both sides.
    """
    raw = (
        spark.read.schema(DOCUMENTS_ORC_SCHEMA)
        .orc(path)
        .withColumn("src_file", F.input_file_name())
    )
    ok = F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    return raw.where(ok), raw.where(~ok)

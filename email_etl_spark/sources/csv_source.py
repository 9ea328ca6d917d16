"""CSV document source with corrupt-record quarantine
(SURVEY.md §2.D sources family — the delimited-text sibling of
jsonl_source.py).

Vendor drops and legacy exports land as CSV; the 100 TB ingestion
contract is the same as JSONL's: (a) schema enforced up front — no
inference pass over the corpus, no silent type coercion drift between
shards; (b) malformed rows quarantined with lineage, never dropped
silently, never failing the job; (c) the scan stays splittable.
Spark's native CSV reader does all three declaratively: PERMISSIVE
mode routes unparseable rows into `columnNameOfCorruptRecord`, and
with `multiLine` left off (the default) the read splits by line even
inside one huge file.

The one CSV-specific trap this module owns: quoted embedded newlines
require `multiLine=true`, which makes a file UNSPLITTABLE (one task
per file). `read_documents_csv` therefore rejects that option by
design and the docstring directs multi-line payloads to JSONL/parquet
landing instead — at 100 TB an unsplittable text scan is an outage,
not a convenience.

Reference surface: the provider payload landing step generalized
(ref: raw payload persistence, src/etl_pipeline.py:60-104); the
quarantine mirrors the failed-payload quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        # PERMISSIVE parse errors land here instead of killing the job
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_csv(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a headered CSV documents corpus with a fixed schema.

    Returns (good, quarantine):
    - good: schema-conforming rows with non-null doc_id and text,
      plus `src_file` lineage;
    - quarantine: raw corrupt lines (type mismatches, wrong column
      counts) and rows missing required fields, with lineage.

    Splittability contract: multiLine stays OFF — quoted embedded
    newlines are not supported here; land such payloads as JSONL or
    parquet instead (see module docstring).
    """
    raw = (
        spark.read.schema(DOCUMENTS_CSV_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("enforceSchema", "true")
        .csv(path)
        .withColumn("src_file", F.input_file_name())
    )
    ok = (
        F.col("_corrupt_record").isNull()
        & F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
    )
    good = raw.where(ok).drop("_corrupt_record")
    quarantine = raw.where(~ok).select(
        "src_file",
        F.coalesce(
            F.col("_corrupt_record"),
            F.concat_ws(
                ",",
                F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
                F.coalesce(F.col("text"), F.lit("")),
                F.coalesce(F.col("lang"), F.lit("")),
                F.coalesce(F.col("source"), F.lit("")),
                F.coalesce(F.col("n_chars").cast("string"), F.lit("")),
            ),
        ).alias("raw_line"),
    )
    return good, quarantine

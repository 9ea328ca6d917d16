"""JSONL document source with corrupt-record quarantine
(SURVEY.md §2.D sources family).

Training corpora land as JSONL shards far more often than parquet;
the ingestion contract a 100 TB pipeline needs is (a) schema
enforcement, (b) malformed lines quarantined — never dropped
silently, never failing the job — and (c) a lineage column saying
which shard a row came from. Spark's native JSON reader does all
three declaratively: PERMISSIVE mode routes unparseable lines into
`columnNameOfCorruptRecord`, the scan stays splittable (JSONL is
line-delimited), and schema is enforced up front (no inference pass
over 100 TB).

Reference surface: the provider payload landing step generalized
(ref: raw payload persistence, src/etl_pipeline.py:60-104); the
quarantine mirrors pipeline.py's failed-payload quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
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


def read_documents_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents corpus with a fixed schema.

    Returns (good, quarantine):
    - good: rows matching DOCUMENTS_JSONL_SCHEMA with a non-null
      doc_id and text, plus `src_file` lineage;
    - quarantine: the raw corrupt lines (plus rows missing required
      fields), with lineage — the never-drop-silently contract.
    """
    raw = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("src_file", F.input_file_name())
    )
    # Spark requires caching/materializing before filtering on the
    # corrupt-record column alone; keep the predicate composite
    ok = F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull() & F.col(
        "text"
    ).isNotNull()
    good = raw.where(ok).drop("_corrupt_record")
    quarantine = raw.where(~ok).select(
        "src_file",
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))).alias("raw_line"),
    )
    return good, quarantine

"""XML document source via Spark 4's NATIVE XML reader (SPARK-44265
— spark-xml folded into core; no external package): the third
delimited-ingest contract next to jsonl_source / csv_source, same
rules — (a) schema enforced up front, (b) malformed records
quarantined with lineage via PERMISSIVE + columnNameOfCorruptRecord,
(c) no silent drops.

Scale note: XML records are framed by `rowTag`, and Spark's reader
splits files between row tags, so a directory of large feed exports
parallelizes like any text corpus; a document that nests its rows
inside one huge unsplittable element is the XML analog of the CSV
multiLine trap (csv_source.py) — land those as JSONL instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_xml(
    spark: SparkSession, path: str, row_tag: str = "doc"
) -> tuple[DataFrame, DataFrame]:
    """Read an XML documents corpus (`<doc>...</doc>` records) with a
    fixed schema. Returns (good, quarantine) — the jsonl/csv contract."""
    raw = (
        spark.read.format("xml")
        .schema(DOCUMENTS_XML_SCHEMA)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(path)
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
            F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")),
        ).alias("raw_record"),
    )
    return good, quarantine

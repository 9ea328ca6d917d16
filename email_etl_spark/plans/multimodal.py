"""Multimodal registry queries (SURVEY.md §2.J).

The decode passes in operators/multimodal.py are deterministic
hash-derived stubs (this container ships no codec libraries), which
makes them *oracle-checkable*: a DuckDB twin reconstructs the stub's
width/height arithmetic from the sha256 hex digest, so the whole
Arrow seam — binary column in, mapInPandas batch_fn, typed feature
schema out — is hash-verified cross-engine, not just pytest-smoked.

The binary corpus is derived inside the query (UTF-8 payload bytes of
the documents table) so both engines see identical blobs without any
side files. A real codec swaps into _decode_image without changing
the plan; only the oracle twin would then need the real library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.operators.multimodal import image_features
from email_etl_spark.plans.registry import register

# hex-pair → byte value, in pure SQL (DuckDB's sha256 returns hex)
_HEX = "0123456789abcdef"


def _byte_sql(sha: str, i: int) -> str:
    """Byte i (0-based) of a hex digest column, as an integer."""
    c1 = f"substr({sha}, {2 * i + 1}, 1)"
    c2 = f"substr({sha}, {2 * i + 2}, 1)"
    return f"(16 * (strpos('{_HEX}', {c1}) - 1) + strpos('{_HEX}', {c2}) - 1)"


@register(
    "image_decode_stats",
    oracle=f"""
WITH b AS (SELECT text, sha256(text) AS sha FROM documents),
wh AS (
  SELECT sha,
         16 + ({_byte_sql('sha', 0)} % 240) AS width,
         16 + ({_byte_sql('sha', 1)} % 240) AS height,
         length(text) > 0 AS decode_ok
  FROM b
)
SELECT CAST(width // 64 AS BIGINT) AS width_bucket,
       COUNT(*) AS n_images,
       CAST(SUM(CASE WHEN decode_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       COUNT(DISTINCT sha) AS n_uniq,
       MIN(sha) AS min_hash,
       ROUND(CAST(SUM(height) AS DOUBLE) / COUNT(*), 4) AS avg_height
FROM wh GROUP BY 1 ORDER BY 1
""",
    doc=(
        "Image-decode QA rollup over a binary column — runs the REAL "
        "operators/multimodal.py mapInPandas decode pass (Arrow "
        "batches, typed feature schema) and rolls up width-bucket "
        "counts, decode success, distinct payload hashes, and mean "
        "height. The oracle reconstructs the deterministic stub codec "
        "from the sha256 hex digest, so the whole multimodal seam is "
        "hash-verified cross-engine. Payload bytes never reach the "
        "aggregation (the UDF projects metadata only); at corpus "
        "scale the decode stage is the only pass that touches blobs."
    ),
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(F.encode(F.col("text"), "UTF-8").alias("content"))
    feats = image_features(blobs)
    return (
        feats.groupBy(F.expr("width div 64").cast("bigint").alias("width_bucket"))
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).cast("bigint").alias("n_ok"),
            F.countDistinct("content_hash").alias("n_uniq"),
            F.min("content_hash").alias("min_hash"),
            F.round(F.sum("height").cast("double") / F.count("*"), 4).alias("avg_height"),
        )
        .orderBy("width_bucket")
    )

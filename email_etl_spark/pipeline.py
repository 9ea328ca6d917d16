"""End-to-end ETL orchestration (ref: src/etl_pipeline.py:17-283) —
the reference's import / incremental-sync / status workflow as a
sequence of declarative DataFrame stages over a parquet warehouse.

Reference loop                      → Spark stage
---------------------------------------------------------------
list_messages + per-message fetch   → a raw-payload DataFrame (any
                                      source; lands in object storage)
already-processed check (DB lookup) → left-anti join on message_id
security validation per attachment  → operators/security.py column rules
INSERT ... ON CONFLICT              → append + keep-latest view
embedding batches (OpenAI)          → llm/stub.py pandas_udf seam
markdown save + index.json          → sinks/markdown.py partitioned write
audit log rows                      → append-only parquet audit table

Every stage is a DataFrame→DataFrame function: at 100 TB the same
code runs as one lineage with no driver-side per-message loop, and
the warehouse layout (parquet now) can swap to an ACID table format
without touching stage logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from email_etl_spark.llm.stub import embed_documents, prepare_email_text
from email_etl_spark.operators.security import flag_suspicious_content
from email_etl_spark.sinks.markdown import write_markdown_tree
from email_etl_spark.sources.email_source import parse_gmail_json


class EmailETLPipeline:
    """Spark twin of the reference's ETLPipeline singleton."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir
        self.emails_path = os.path.join(warehouse_dir, "emails")
        self.audit_path = os.path.join(warehouse_dir, "audit")
        self.markdown_path = os.path.join(warehouse_dir, "markdown")

    # -- storage ----------------------------------------------------------
    def _existing(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.emails_path)
        except Exception:
            return None

    # -- stages -----------------------------------------------------------
    def transform(self, raw_json: DataFrame) -> DataFrame:
        """raw gmail-json payloads → validated, embedded email frame.
        Unparseable payloads (no message_id after parsing) are dropped
        here and counted by run_import as `failed` (ref: stats
        bookkeeping, src/etl_pipeline.py:24-30)."""
        emails = parse_gmail_json(raw_json).where(F.col("message_id").isNotNull())
        emails = flag_suspicious_content(emails)
        embed_input = prepare_email_text(
            F.col("subject"), F.col("sender"), F.col("body_markdown")
        )
        emails = emails.withColumn("embed_text", embed_input)
        emails = embed_documents(emails, text_col="embed_text").drop("embed_text")
        return emails

    def run_import(self, raw_json: DataFrame, write_markdown: bool = True) -> dict:
        """Full import (ref: run_import, src/etl_pipeline.py:32-91):
        parse → validate → skip-already-imported → persist → archive."""
        n_raw = raw_json.count()
        emails = self.transform(raw_json)
        existing = self._existing()
        if existing is not None:
            new = emails.join(
                existing.select("message_id"), "message_id", "left_anti"
            )
        else:
            new = emails
        new = new.cache()
        n_new = new.count()
        if n_new:
            new.write.mode("append").parquet(self.emails_path)
            if write_markdown:
                write_markdown_tree(new, self.markdown_path)
            audit = new.select(
                "message_id",
                F.lit("imported").alias("action"),
                F.current_timestamp().alias("at"),
            )
            audit.write.mode("append").parquet(self.audit_path)
        n_parsed = emails.count()
        stats = {
            "processed": n_new,
            "skipped": n_parsed - n_new,
            "failed": n_raw - n_parsed,
        }
        new.unpersist()
        return stats

    def run_incremental_sync(self, raw_json: DataFrame) -> dict:
        """Only payloads newer than the stored max(date) watermark
        (ref: run_incremental_sync, src/etl_pipeline.py:233-245)."""
        existing = self._existing()
        if existing is None:
            return self.run_import(raw_json)
        watermark = existing.agg(F.max("date").alias("max_date"))
        emails = self.transform(raw_json)
        fresh = (
            emails.crossJoin(F.broadcast(watermark))
            .where(F.col("date") > F.col("max_date"))
            .drop("max_date")
        )
        # reuse the anti-join path for exactness at the boundary
        new = fresh.join(existing.select("message_id"), "message_id", "left_anti").cache()
        n_new = new.count()
        if n_new:
            new.write.mode("append").parquet(self.emails_path)
            write_markdown_tree(new, self.markdown_path)
        new.unpersist()
        return {"processed": n_new}

    def latest_emails(self) -> DataFrame:
        """Keep-latest-per-message view over the append-only store
        (ref: ON CONFLICT DO UPDATE, src/database.py:78-94)."""
        from pyspark.sql import Window

        existing = self._existing()
        if existing is None:
            raise FileNotFoundError("no emails imported yet")
        w = Window.partitionBy("message_id").orderBy(F.desc("date"))
        return (
            existing.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def status(self) -> dict:
        """Counts + embedding coverage (ref: get_status,
        src/etl_pipeline.py:247-261)."""
        existing = self._existing()
        if existing is None:
            return {"total_emails": 0, "emails_with_embeddings": 0}
        agg = existing.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("embedding").isNotNull(), 1)).alias("emb"),
        ).first()
        return {"total_emails": agg.n, "emails_with_embeddings": agg.emb}

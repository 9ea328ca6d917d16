"""Canonical email schema — the Spark twin of the reference's emails
table (ref: scripts/init_db.sql:14-49) and of the standardized dict
produced by provider parsing (ref: src/providers/gmail/provider.py:260-284).

At cluster scale this is the contract between sources, operators and
sinks; everything downstream is schema-pruned off it.
"""

from __future__ import annotations

from pyspark.sql import types as T

ATTACHMENT_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("attachment_id", T.StringType()),
        T.StructField("content", T.BinaryType()),  # opaque payload (multimodal column)
        T.StructField("content_hash", T.StringType()),
        T.StructField("is_safe", T.BooleanType()),
    ]
)

EMAIL_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.StringType(), nullable=False),
        T.StructField("thread_id", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("sender", T.StringType()),
        T.StructField("sender_name", T.StringType()),
        T.StructField("recipients", T.ArrayType(T.StringType())),
        T.StructField("cc_recipients", T.ArrayType(T.StringType())),
        T.StructField("bcc_recipients", T.ArrayType(T.StringType())),
        T.StructField("date", T.TimestampType()),
        T.StructField("body_plain", T.StringType()),
        T.StructField("body_html", T.StringType()),
        T.StructField("body_markdown", T.StringType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("has_attachments", T.BooleanType()),
        T.StructField("attachments", T.ArrayType(ATTACHMENT_SCHEMA)),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Gmail-API-like raw message payload (ref: provider.py:227-284 input shape)
RAW_GMAIL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("threadId", T.StringType()),
        T.StructField("labelIds", T.ArrayType(T.StringType())),
        T.StructField("snippet", T.StringType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("body_plain", T.StringType()),
        T.StructField("body_html", T.StringType()),
        T.StructField(
            "attachments",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("filename", T.StringType()),
                        T.StructField("mimeType", T.StringType()),
                        T.StructField("size", T.LongType()),
                        T.StructField("attachmentId", T.StringType()),
                        T.StructField("data", T.StringType()),  # base64
                    ]
                )
            ),
        ),
    ]
)

"""ETL orchestration + security validation end-to-end
(ref workflow: src/etl_pipeline.py; SURVEY §1)."""

from __future__ import annotations

import base64
import json

import pytest


def _msg(i: int, date: str, attach: bool = False, body: str = "hello there") -> str:
    m = {
        "id": f"m-{i:03d}",
        "threadId": "t-1",
        "labelIds": ["INBOX"],
        "snippet": "snip",
        "headers": [
            {"name": "From", "value": f"Sender {i} <s{i}@corp.com>"},
            {"name": "To", "value": "dest@corp.com"},
            {"name": "Subject", "value": f"msg {i}"},
            {"name": "Date", "value": f"{date} +0000"},
        ],
        "body_plain": body,
        "body_html": None,
        "attachments": [],
    }
    if attach:
        m["attachments"] = [
            {
                "filename": "ok.pdf",
                "mimeType": "application/pdf",
                "size": 5,
                "attachmentId": "a1",
                "data": base64.b64encode(b"%PDF-x").decode(),
            },
            {
                "filename": "evil.exe",
                "mimeType": "application/pdf",
                "size": 4,
                "attachmentId": "a2",
                "data": base64.b64encode(b"MZ\x90\x00").decode(),
            },
        ]
    return json.dumps(m)


@pytest.fixture()
def pipeline(spark, tmp_path):
    from email_etl_spark.pipeline import EmailETLPipeline

    return EmailETLPipeline(spark, str(tmp_path / "wh"))


def test_import_dedup_and_sync(spark, pipeline):
    raw1 = spark.createDataFrame(
        [(_msg(1, "Mon, 4 Aug 2025 09:00:00"),), (_msg(2, "Mon, 4 Aug 2025 10:00:00"),)],
        ["payload"],
    )
    stats = pipeline.run_import(raw1)
    assert stats == {"processed": 2, "skipped": 0, "failed": 0}

    # re-import the same payloads → all skipped (anti-join dedup)
    stats2 = pipeline.run_import(raw1)
    assert stats2 == {"processed": 0, "skipped": 2, "failed": 0}

    # incremental sync: one older (filtered by watermark), one newer
    raw2 = spark.createDataFrame(
        [(_msg(3, "Mon, 4 Aug 2025 08:00:00"),), (_msg(4, "Mon, 4 Aug 2025 11:00:00"),)],
        ["payload"],
    )
    stats3 = pipeline.run_incremental_sync(raw2)
    assert stats3 == {"processed": 1}

    st = pipeline.status()
    assert st["total_emails"] == 3
    assert st["emails_with_embeddings"] == 3
    latest = pipeline.latest_emails()
    assert latest.count() == 3


def test_suspicious_content_flagging(spark, pipeline):
    raw = spark.createDataFrame(
        [
            (_msg(1, "Mon, 4 Aug 2025 09:00:00", body="please verify your account immediately"),),
            (_msg(2, "Mon, 4 Aug 2025 10:00:00", body="lunch at noon?"),),
        ],
        ["payload"],
    )
    emails = pipeline.transform(raw).collect()
    by_id = {e.message_id: e for e in emails}
    assert by_id["m-001"].is_suspicious
    assert not by_id["m-002"].is_suspicious


def test_attachment_validation(spark):
    from email_etl_spark.operators.security import attachment_report
    from email_etl_spark.sources.email_source import parse_gmail_json

    raw = spark.createDataFrame([(_msg(1, "Mon, 4 Aug 2025 09:00:00", attach=True),)], ["payload"])
    report = attachment_report(parse_gmail_json(raw)).collect()
    by_name = {r.filename: r for r in report}
    ok = by_name["ok.pdf"]
    assert ok.is_safe and ok.detected_mime == "application/pdf" and not ok.mime_mismatch
    evil = by_name["evil.exe"]
    assert not evil.is_safe and evil.dangerous_extension
    # declared pdf but content is not a pdf → mismatch surfaced
    assert evil.detected_mime is None or evil.mime_mismatch


def test_malformed_payload_counted_failed(spark, pipeline):
    raw = spark.createDataFrame(
        [(_msg(1, "Mon, 4 Aug 2025 09:00:00"),), ("{not valid json",), ("42",)],
        ["payload"],
    )
    stats = pipeline.run_import(raw)
    assert stats == {"processed": 1, "skipped": 0, "failed": 2}

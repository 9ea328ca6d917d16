"""Python DataSource API contract (SURVEY §2.D sources family): the
mbox format string frames archives per-file with lineage, and the raw
rows flow through the one shared RFC-2822 parser."""

from __future__ import annotations

MSG = """From alice@example.com Thu Jan  4 09:00:00 2024
From: Alice <alice@example.com>
To: bob@example.com
Subject: {subj}
Date: Thu, 4 Jan 2024 09:0{i}:00 +0000

body {i}
"""


def _write_mbox(path, n, start=0):
    path.write_text(
        "".join(MSG.format(subj=f"msg {start + i}", i=(start + i) % 10) for i in range(n))
    )


def test_mbox_format_reads_messages(spark, tmp_path):
    from email_etl_spark.sources.mbox_datasource import MboxDataSource

    _write_mbox(tmp_path / "a.mbox", 3)
    _write_mbox(tmp_path / "b.mbox", 2, start=3)
    spark.dataSource.register(MboxDataSource)
    df = spark.read.format("mbox").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 5
    assert {r.msg_idx for r in rows if r.src_file.endswith("a.mbox")} == {0, 1, 2}
    assert all("Subject: msg" in r.raw for r in rows)

    # one parser path: the raw frames parse through parse_rfc822
    from email_etl_spark.sources.email_source import parse_rfc822

    parsed = parse_rfc822(df.selectExpr("raw"))
    subjects = {r.subject for r in parsed.collect()}
    assert subjects == {f"msg {i}" for i in range(5)}


def test_mbox_format_missing_path_errors(spark, tmp_path):
    import pytest

    from email_etl_spark.sources.mbox_datasource import MboxDataSource

    spark.dataSource.register(MboxDataSource)
    with pytest.raises(Exception):
        spark.read.format("mbox").load(str(tmp_path / "nope")).collect()

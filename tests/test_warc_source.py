"""WARC ingestion contract (SURVEY §2.D sources family): ISO 28500
record framing by Content-Length, HTTP payload split for response
records, gzip transparency, malformed framing quarantined with file +
offset lineage — never dropped silently, never failing the job."""

from __future__ import annotations

import gzip


def _record(warc_type: str, uri: str | None, payload: bytes, ctype: str) -> bytes:
    hdr = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:uuid:" + warc_type.encode() + b"-1>",
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"Content-Type: " + ctype.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        hdr.insert(2, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


def _sample_warc() -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n", "application/warc-fields")
        + _record(
            "response",
            "http://example.com/a",
            _http_response(b"<html>hello crawl</html>"),
            "application/http; msgtype=response",
        )
        + _record(
            "request",
            "http://example.com/a",
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
            "application/http; msgtype=request",
        )
    )


def test_warc_records_and_http_split(spark, tmp_path):
    from email_etl_spark.sources.warc_source import read_warc

    (tmp_path / "seg-000.warc").write_bytes(_sample_warc())
    rows = {r["warc_type"]: r.asDict() for r in read_warc(spark, str(tmp_path)).collect()}

    assert set(rows) == {"warcinfo", "response", "request"}
    resp = rows["response"]
    assert resp["target_uri"] == "http://example.com/a"
    assert resp["http_status"] == 200
    assert resp["body"] == "<html>hello crawl</html>"  # HTTP headers stripped
    assert resp["warc_file"] == "seg-000.warc"
    # non-HTTP payloads pass through whole
    assert rows["warcinfo"]["body"] == "software: test\r\n"
    assert rows["warcinfo"]["http_status"] is None


def test_warc_gzip_transparent(spark, tmp_path):
    from email_etl_spark.sources.warc_source import read_warc

    # real crawl files are per-record gzip MEMBERS concatenated;
    # stdlib gzip reads the concatenation transparently — write one
    # member per record to exercise exactly that
    members = [
        _record("warcinfo", None, b"software: test\r\n", "application/warc-fields"),
        _record(
            "response",
            "http://example.com/a",
            _http_response(b"<html>hello crawl</html>"),
            "application/http; msgtype=response",
        ),
        _record(
            "request",
            "http://example.com/a",
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
            "application/http; msgtype=request",
        ),
    ]
    gz = b"".join(gzip.compress(m) for m in members)
    (tmp_path / "seg-001.warc.gz").write_bytes(gz)
    df = read_warc(spark, str(tmp_path))
    assert df.count() == 3
    assert df.where(df.http_status == 200).count() == 1


def test_warc_malformed_quarantined(spark, tmp_path):
    from email_etl_spark.sources.warc_source import read_warc

    good = _sample_warc()
    # truncate mid-payload of a final record: framing is lost there
    bad = good + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    (tmp_path / "seg-002.warc").write_bytes(bad)
    rows = read_warc(spark, str(tmp_path)).collect()

    mal = [r for r in rows if r["warc_type"] == "_malformed"]
    assert len(mal) == 1
    assert mal[0]["warc_file"] == "seg-002.warc"
    assert mal[0]["offset"] == len(good)  # lineage points at the bad record
    # the good prefix still parses
    assert sum(1 for r in rows if r["warc_type"] == "response") == 1

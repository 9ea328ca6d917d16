"""WARC source (ISO 28500) — the landing format of web-crawl corpora
(Common-Crawl-style archives), read into typed rows.

Ingest shape: the driver lists file NAMES only; executors parse whole
WARC files inside an Arrow-batched mapInPandas (the Maildir manifest
pattern, sources/email_source.py::read_maildir). A WARC file must be
parsed sequentially — records are length-delimited by Content-Length
and payloads may contain anything, so a line-splitting text source
cannot scan one — but file-level parallelism is exactly how crawl
archives shard at scale (Common Crawl ships ~1 GB segment files by
the tens of thousands), so the manifest distributes and each task
owns whole files. `.warc.gz` is handled by stdlib gzip, which
transparently concatenates the per-record gzip members real crawl
files use.

Malformed content is NEVER silently dropped: a record whose header
block does not parse, or whose Content-Length overruns the file,
yields one `_malformed` row carrying the file and byte offset (the
jsonl_source quarantine contract).

Ref: the reference ingests email via the Gmail API (src/providers/
gmail/provider.py); WARC is the equivalent raw-payload landing path
for the web-document corpora this engine's curation/dedup operators
exist to process.
"""

from __future__ import annotations

import gzip
import io
import os

WARC_SCHEMA = (
    "warc_file string, offset long, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, http_status int, body string"
)

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str] | None:
    """Parse a WARC (or HTTP) header block into a dict; None if the
    first line is not a WARC/HTTP version line."""
    lines = block.split(b"\r\n")
    if not lines or not (
        lines[0].startswith(b"WARC/") or lines[0].startswith(b"HTTP/")
    ):
        return None
    out: dict[str, str] = {"_first": lines[0].decode("latin-1")}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            out[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return out


def parse_warc_bytes(data: bytes, warc_file: str) -> list[dict]:
    """Parse one WARC file's bytes into record dicts (WARC_SCHEMA
    fields). Sequential by necessity — records are length-delimited."""
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(_CRLF2, pos)
        hdr = _parse_headers(data[pos:end_hdr]) if end_hdr != -1 else None
        clen = None
        if hdr is not None:
            try:
                clen = int(hdr.get("content-length", ""))
            except ValueError:
                clen = None
        if hdr is None or clen is None or end_hdr + 4 + clen > n:
            rows.append(
                {
                    "warc_file": warc_file,
                    "offset": pos,
                    "record_id": None,
                    "warc_type": "_malformed",
                    "target_uri": None,
                    "warc_date": None,
                    "content_type": None,
                    "content_length": None,
                    "http_status": None,
                    "body": None,
                }
            )
            break  # framing lost: cannot resync reliably past this point
        payload = data[end_hdr + 4 : end_hdr + 4 + clen]
        http_status = None
        body = payload
        if hdr.get("content-type", "").startswith("application/http"):
            split = payload.find(_CRLF2)
            if split != -1:
                http = _parse_headers(payload[:split])
                if http is not None:
                    first = http["_first"].split()
                    if len(first) >= 2 and first[1].isdigit():
                        http_status = int(first[1])
                    body = payload[split + 4 :]
        rows.append(
            {
                "warc_file": warc_file,
                "offset": pos,
                "record_id": hdr.get("warc-record-id"),
                "warc_type": hdr.get("warc-type"),
                "target_uri": hdr.get("warc-target-uri"),
                "warc_date": hdr.get("warc-date"),
                "content_type": hdr.get("content-type"),
                "content_length": clen,
                "http_status": http_status,
                "body": body.decode("utf-8", errors="replace"),
            }
        )
        pos = end_hdr + 4 + clen
    return rows


def read_warc(spark, path: str):
    """Read a directory of .warc / .warc.gz files (or a single file)
    into a DataFrame of WARC_SCHEMA rows."""
    import pandas as pd

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".warc", ".warc.gz"))
        )
    else:
        files = [path]
    par = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    paths_df = spark.createDataFrame([(p,) for p in files], "path string").repartition(par)

    def read_files(batches):
        for pdf in batches:
            rows: list[dict] = []
            for p in pdf["path"]:
                if p.endswith(".gz"):
                    with gzip.open(p, "rb") as fh:
                        data = fh.read()
                else:
                    with io.open(p, "rb") as fh:
                        data = fh.read()
                rows.extend(parse_warc_bytes(data, os.path.basename(p)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "offset",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "http_status",
                    "body",
                ],
            )

    return paths_df.mapInPandas(read_files, WARC_SCHEMA)

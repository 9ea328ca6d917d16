"""JSONL ingestion contract (SURVEY §2.D sources family): schema
enforced up front, malformed lines quarantined with lineage — never
dropped silently, never failing the job."""

from __future__ import annotations

import json


def test_jsonl_source_good_and_quarantine(spark, tmp_path):
    from email_etl_spark.sources.jsonl_source import read_documents_jsonl

    shard = tmp_path / "part-000.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1", "n_chars": 7}),
        '{"doc_id": 3, "text": "broken',            # malformed JSON
        json.dumps({"doc_id": None, "text": "no id", "lang": "en", "source": "s0", "n_chars": 5}),
        json.dumps({"doc_id": 5, "lang": "en", "source": "s0", "n_chars": 0}),  # missing text
    ]
    shard.write_text("\n".join(lines) + "\n")

    good, quarantine = read_documents_jsonl(spark, str(tmp_path))
    g = {r["doc_id"]: r.asDict() for r in good.collect()}
    q = quarantine.collect()

    # schema + filter contract
    assert set(g) == {1, 2}
    assert g[1]["text"] == "hello world" and g[1]["lang"] == "en"
    assert all(r["src_file"].endswith("part-000.jsonl") for r in good.collect())

    # quarantine: the malformed line survives verbatim, the
    # missing-field rows survive as re-serialized JSON — 3 total,
    # nothing silently dropped (5 in = 2 good + 3 quarantined)
    assert len(q) == 3
    raws = [r["raw_line"] for r in q]
    assert any('"broken' in r for r in raws)
    assert all(r["src_file"].endswith("part-000.jsonl") for r in q)


def test_jsonl_source_roundtrips_parquet_corpus(spark, tmp_path):
    """Exporting the parquet corpus to JSONL and re-reading it through
    the source must be lossless for the good path."""
    from email_etl_spark.io import load_table
    from email_etl_spark.sources.jsonl_source import read_documents_jsonl

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "jsonl")
    docs.coalesce(1).write.json(out)
    good, quarantine = read_documents_jsonl(spark, out)
    assert quarantine.count() == 0
    assert good.count() == docs.count()
    a = sorted(r["doc_id"] for r in good.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert a == b

"""CSV ingestion contract (SURVEY §2.D sources family): fixed schema,
malformed rows quarantined with lineage — the delimited-text sibling
of the JSONL contract in test_jsonl_source.py."""

from __future__ import annotations


def test_csv_source_good_and_quarantine(spark, tmp_path):
    from email_etl_spark.sources.csv_source import read_documents_csv

    shard = tmp_path / "part-000.csv"
    rows = [
        "doc_id,text,lang,source,n_chars",
        '1,hello world,en,s0,11',
        '2,bonjour,fr,s1,7',
        'notanumber,bad id row,en,s0,5',      # type mismatch -> corrupt
        ',no id,en,s0,5',                     # missing required doc_id
        '5,,en,s0,0',                         # missing required text
    ]
    shard.write_text("\n".join(rows) + "\n")

    good, quarantine = read_documents_csv(spark, str(tmp_path))
    g = {r["doc_id"]: r.asDict() for r in good.collect()}
    q = quarantine.collect()

    assert set(g) == {1, 2}
    assert g[1]["text"] == "hello world" and g[2]["lang"] == "fr"
    assert all(r["src_file"].endswith("part-000.csv") for r in good.collect())

    # 5 data rows in = 2 good + 3 quarantined; nothing silently dropped
    assert len(q) == 3
    raws = [r["raw_line"] for r in q]
    assert any("notanumber" in r for r in raws)
    assert all(r["src_file"].endswith("part-000.csv") for r in q)


def test_csv_source_quarantines_wrong_column_count(spark, tmp_path):
    from email_etl_spark.sources.csv_source import read_documents_csv

    shard = tmp_path / "part-001.csv"
    shard.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "7,ok row,en,s2,6\n"
        "8,too,many,columns,here,extra,cols\n"
    )
    good, quarantine = read_documents_csv(spark, str(tmp_path))
    assert [r["doc_id"] for r in good.collect()] == [7]
    q = quarantine.collect()
    assert len(q) == 1 and "extra" in q[0]["raw_line"]

"""Native-XML ingestion contract (SURVEY §2.D sources family): fixed
schema, malformed records quarantined with lineage — the third
delimited contract next to JSONL and CSV."""

from __future__ import annotations


def test_xml_source_good_and_quarantine(spark, tmp_path):
    from email_etl_spark.sources.xml_source import read_documents_xml

    shard = tmp_path / "part-000.xml"
    shard.write_text(
        "<docs>"
        "<doc><doc_id>1</doc_id><text>hello world</text><lang>en</lang>"
        "<source>s0</source><n_chars>11</n_chars></doc>"
        "<doc><doc_id>2</doc_id><text>bonjour</text><lang>fr</lang>"
        "<source>s1</source><n_chars>7</n_chars></doc>"
        "<doc><doc_id>notanumber</doc_id><text>bad id</text><lang>en</lang>"
        "<source>s0</source><n_chars>6</n_chars></doc>"
        "<doc><text>no id</text><lang>en</lang>"
        "<source>s0</source><n_chars>5</n_chars></doc>"
        "</docs>"
    )
    good, quarantine = read_documents_xml(spark, str(tmp_path))
    g = {r.doc_id: r.asDict() for r in good.collect()}
    q = quarantine.collect()

    assert set(g) == {1, 2}
    assert g[1]["text"] == "hello world" and g[2]["lang"] == "fr"
    assert all(r["src_file"].endswith("part-000.xml") for r in good.collect())
    # 4 records in = 2 good + 2 quarantined (type mismatch, missing id)
    assert len(q) == 2
    assert all(r["src_file"].endswith("part-000.xml") for r in q)

"""ORC ingestion contract (SURVEY §2.D sources family): fixed
enforced schema, required-field quarantine with lineage, and the
columnar pushdown properties the 100 TB path relies on."""

from __future__ import annotations


def _write_corpus(spark, path: str) -> None:
    rows = [
        (1, "hello world", "en", "s0", 11),
        (2, "bonjour", "fr", "s1", 7),
        (None, "orphan row", "en", "s0", 10),  # missing doc_id
        (4, None, "en", "s1", 0),  # missing text
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").orc(path)


def test_orc_source_good_and_quarantine(spark, tmp_path):
    from email_etl_spark.sources.orc_source import read_documents_orc

    path = str(tmp_path / "docs_orc")
    _write_corpus(spark, path)

    good, quarantine = read_documents_orc(spark, path)
    g = {r["doc_id"]: r.asDict() for r in good.collect()}
    q = quarantine.collect()

    assert set(g) == {1, 2}
    assert g[2]["lang"] == "fr"
    assert all(r["src_file"].endswith(".orc") or "part-" in r["src_file"] for r in good.collect())
    # 4 rows in = 2 good + 2 quarantined; nothing silently dropped
    assert len(q) == 2


def test_orc_scan_prunes_and_pushes_down(spark, tmp_path):
    from email_etl_spark.sources.orc_source import read_documents_orc

    path = str(tmp_path / "docs_orc2")
    _write_corpus(spark, path)

    good, _ = read_documents_orc(spark, path)
    df = good.where(good.doc_id == 1).select("doc_id", "lang")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # predicate reaches the ORC scan; unreferenced columns are pruned
    # (text stays: the quarantine split's text-non-null predicate
    # legitimately reads it even though the projection drops it)
    assert "PushedFilters" in plan and "doc_id" in plan, plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "n_chars" not in read and "source" not in read, read

"""Arrow IPC ingestion contract (SURVEY §2.D sources family): enforced
schema with loud drift failure, required-field quarantine with
lineage, paths-distributed executor-side reads."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.feather as feather
import pytest


def _write_shard(path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    feather.write_feather(tbl, str(path))


def test_arrow_source_good_and_quarantine(spark, tmp_path):
    from email_etl_spark.sources.arrow_source import read_documents_arrow

    p1 = tmp_path / "shard-0.arrow"
    p2 = tmp_path / "shard-1.arrow"
    _write_shard(p1, [(1, "hello world", "en", "s0", 11), (None, "orphan", "en", "s0", 6)])
    _write_shard(p2, [(2, "bonjour", "fr", "s1", 7), (4, None, "en", "s1", 0)])

    good, quarantine = read_documents_arrow(spark, [str(p1), str(p2)])
    g = {r["doc_id"]: r.asDict() for r in good.collect()}
    q = quarantine.collect()

    assert set(g) == {1, 2}
    assert g[2]["lang"] == "fr"
    assert g[1]["src_file"].endswith("shard-0.arrow")
    # 4 rows in = 2 good + 2 quarantined, each with lineage
    assert len(q) == 2 and all(r["src_file"] for r in q)


def test_arrow_source_rejects_schema_drift(spark, tmp_path):
    from email_etl_spark.sources.arrow_source import read_documents_arrow

    bad = tmp_path / "drifted.arrow"
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()), "body": pa.array(["x"])})
    feather.write_feather(tbl, str(bad))

    good, _ = read_documents_arrow(spark, [str(bad)])
    with pytest.raises(Exception, match="schema drift"):
        good.collect()

"""Schema evolution contract (SURVEY §4): a corpus accretes columns
over time; readers must merge old and new shard schemas without
rewriting history — at 100 TB a backfill is a migration project, so
additive evolution with NULL backfill is the operating mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def evolved_corpus(spark, tmp_path):
    path = str(tmp_path / "docs")
    v1 = spark.createDataFrame(
        [(1, "old doc", "en"), (2, "older doc", "fr")],
        "doc_id long, text string, lang string",
    )
    v1.write.parquet(path + "/batch=1")
    # v2 shards add a quality column (additive evolution)
    v2 = spark.createDataFrame(
        [(3, "new doc", "en", 0.9), (4, "newer doc", "de", 0.4)],
        "doc_id long, text string, lang string, quality double",
    )
    v2.write.parquet(path + "/batch=2")
    return path


def test_merge_schema_backfills_nulls(spark, evolved_corpus):
    df = spark.read.option("mergeSchema", "true").parquet(evolved_corpus)
    assert set(df.columns) >= {"doc_id", "text", "lang", "quality"}
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 4
    # old shards surface the new column as NULL, not as an error
    assert rows[1].quality is None and rows[2].quality is None
    assert rows[3].quality == 0.9
    # and filters on the evolved column behave three-valued: NULLs drop
    assert df.where(F.col("quality") > 0.5).count() == 1


def test_without_merge_schema_first_footer_wins(spark, evolved_corpus):
    """The failure mode the option exists for: a plain read picks ONE
    footer's schema, silently dropping (or failing on) the new column
    depending on which shard is sampled — pin the contract that our
    ingestion always passes mergeSchema for evolving corpora."""
    df = spark.read.parquet(evolved_corpus)
    # whichever footer won, the read must not crash and row count holds
    assert df.count() == 4

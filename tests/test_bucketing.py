"""Co-located join proof (SURVEY §4): bucketed tables joined on the
bucket key produce a shuffle-free (no Exchange) join plan — the
strategy that removes the fact-fact shuffle at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and cannot be pointed at a tmpdir per-test
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # force the sort-merge path: at real scale neither fact side is
    # broadcastable, which is exactly when bucketing pays off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run_bucketed_join_checks(spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _run_bucketed_join_checks(spark):
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = joined._jdf.queryExecution().explainString(mode)
    # the join itself must not shuffle either side
    join_section = plan.split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" in join_section
    assert "Exchange" not in join_section.split("SortMergeJoin")[0], join_section
    assert "Exchange" not in plan, plan  # no shuffle anywhere pre-join
    # and the result is correct
    n = agg.agg(F.sum("n")).first()[0]
    expected = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert n == expected

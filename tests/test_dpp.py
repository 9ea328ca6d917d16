"""Dynamic partition pruning proof (SURVEY §4): a selective dimension
filter must prune the partitioned fact scan AT RUNTIME via a
dynamicpruning subquery — at 100 TB this is the difference between
scanning one month and scanning the whole fact table when the filter
lives on the dim side and the fact is partitioned on the join key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "events_by_type")
    from email_etl_spark.io import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    return path


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_filter_triggers_dynamic_pruning(spark, partitioned_events):
    fact = spark.read.parquet(partitioned_events)
    # dimension: event_type -> weight, filtered dim side. NOTE the
    # filter must be a form Catalyst's isLikelySelective accepts
    # (comparison/IN/LIKE...): a bare boolean attribute (`WHERE conv`)
    # does NOT qualify as a pruning filter and silently disables DPP —
    # that gotcha is exactly why this proof exists.
    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 1), ("click", 0)],
        "event_type string, weight int",
    )
    joined = fact.join(dim, "event_type").where(F.col("weight") > 0)
    plan = _physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruned scan really reads only the 2 matching partitions
    assert joined.select("event_type").distinct().count() == 2
    n_purchase = joined.where(F.col("event_type") == "purchase").count()
    from email_etl_spark.io import load_table

    exact = (
        load_table(spark, SF_SMOKE, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert n_purchase == exact


def test_static_partition_filter_prunes_at_plan_time(spark, partitioned_events):
    """The cheaper static case: a literal predicate on the partition
    column must land in PartitionFilters, not in a post-scan Filter."""
    fact = spark.read.parquet(partitioned_events)
    q = fact.where(F.col("event_type") == "error")
    plan = _physical_plan(q)
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in scan_line.split("PartitionFilters", 1)[1][:120], scan_line

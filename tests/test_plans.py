"""Physical-plan quality gates (SURVEY §5.5): the properties that make
these queries survive a 100x scale-up must be visible in the plan —
broadcast joins for dims, pushed filters, pruned scans, no accidental
cartesian products."""

from __future__ import annotations

import pytest

from email_etl_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier", "top_customers"])
def test_dimension_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan, plan


def test_fact_filter_pushdown(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_column_pruning(spark):
    # top-N over events must not read value/props
    plan = plan_of(spark, "recent_events_topn")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "value" not in read and "props" not in read, read


def test_topn_no_global_sort(spark):
    plan = plan_of(spark, "recent_events_topn")
    assert "TakeOrderedAndProject" in plan, plan


def test_no_accidental_cartesian(spark):
    # every pair-generating dedup query must go through bucket joins,
    # never a cartesian product (dedup_embedding's broadcast NL join is
    # the documented exception at test scale)
    for name in ("dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_partial_aggregation(spark):
    # map-side combine: HashAggregate appears before and after the
    # exchange for the decimal sums
    plan = plan_of(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan


def test_asof_join_no_pair_blowup(spark):
    # the union-sort-window form must plan as a Window, never as an
    # inequality join (BNL/cartesian pair space)
    plan = plan_of(spark, "asof_join")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan


def test_range_join_equality_form(spark):
    # the binned form must run as an equality hash join on (user, bin)
    plan = plan_of(spark, "range_join_count")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_substring_dedup_bucket_join(spark):
    # repeated-shingle discovery must be a key join, never a pair scan
    plan = plan_of(spark, "dedup_substring")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_shard_plan_bounded_windows(spark):
    # two-level prefix sum: windows exist, but no cartesian/BNL and the
    # cross-bucket offsets arrive via broadcast
    plan = plan_of(spark, "shard_plan")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_source_overlap_key_join(spark):
    # the pair space must come from the fingerprint-key self-join
    plan = plan_of(spark, "source_overlap")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_salted_topk_two_phase(spark):
    # both aggregation phases present and the result is a top-N, not a
    # global sort
    plan = plan_of(spark, "salted_topk_users")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x 2 phases


def test_present_sorted_equals_order_by(spark):
    """present_sorted must return the SAME rows in the SAME global
    order as orderBy — it only removes the range-sampling exchange,
    never changes the presentation contract."""
    from email_etl_spark.io import load_table, present_sorted

    ev = load_table(spark, SF_SMOKE, "events")
    agg = ev.groupBy("user_id").count()
    via_order = [tuple(r) for r in agg.orderBy("user_id").collect()]
    via_present = [tuple(r) for r in present_sorted(agg, "user_id").collect()]
    assert via_present == via_order
    # and the plan really has no RangePartitioning exchange
    plan = (
        present_sorted(agg, "user_id")._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower()

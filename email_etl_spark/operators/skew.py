"""Skew-resilient aggregation (SURVEY.md §3 scale invariants).

At 100 TB a handful of hot keys (a viral thread, a bulk sender) can
pin one reducer while the rest idle. Two mitigations live here:

- AQE skew-join splitting is ON by default (session.py) — that covers
  joins with no code change.
- For groupBy aggregations whose per-key state is reassociable
  (count/sum/min/max), `salted_agg` does the classic two-phase salt:
  shuffle once on (key, salt) so a hot key spreads over `salt_buckets`
  reducers, then re-aggregate the tiny partial table on key alone.

The result is EXACTLY equal to the direct groupBy (associative
aggregates only) — asserted by the property test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a uniform salt.

    aggs maps output name → (merge_fn_name, partial expression), where
    merge_fn_name ∈ {sum, min, max} recombines the partials; counts
    recombine with sum. Example::

        salted_agg(events, "user_id", {
            "n_events":  ("sum", F.count("*")),
            "total":     ("sum", F.sum(F.col("value").cast("decimal(18,4)"))),
            "first_ts":  ("min", F.min("ts")),
        })
    """
    salted = df.withColumn(
        "__salt", (F.crc32(F.col(key).cast("string")) + F.monotonically_increasing_id()) % salt_buckets
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(key).agg(
        *[merge[fn](f"__p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
    return final

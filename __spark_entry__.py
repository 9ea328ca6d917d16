"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship hybrid search on sf0.001;
`queries()` / `oracle_sql()` expose the full operator registry from
email_etl_spark.plans (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from email_etl_spark.plans import oracle_sql_map, query_map
from email_etl_spark.plans.registry import REGISTRY

FLAGSHIP = "hybrid_search"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return oracle_sql_map()

"""Named query plans. Importing this package registers every query in
the engine registry (`email_etl_spark.plans.registry.REGISTRY`)."""

from email_etl_spark.plans import (  # noqa: F401  (import for side effect)
    core,
    curation,
    dedup,
    llm,
    patterns,
    relational,
    relational_ext,
    search,
    sessions,
    temporal,
    text,
)
from email_etl_spark.plans.registry import REGISTRY, Query, oracle_sql_map, query_map

__all__ = ["REGISTRY", "Query", "query_map", "oracle_sql_map"]

"""Query registry: one named entry per operator in SURVEY.md §2.

Each query carries its Spark builder and (when SQL-expressible) the
equivalent DuckDB oracle SQL used by the correctness gate. Keeping the
pair side by side is the engine's test discipline: an operator is done
only when both exist and hash-match.

Determinism conventions (so a distributed Spark run hash-matches a
single-threaded oracle):
- money aggregates go through DECIMAL(18,4) (exact, order-insensitive
  distributed sums), then CAST to DOUBLE for a stable output type;
- float scores (cosine etc.) are ROUNDed before they become output or
  ordering keys, and every ORDER BY ... LIMIT has a unique tiebreak;
- timestamps stay UTC (session timezone pinned in session.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def query_map() -> dict[str, Builder]:
    return {name: q.builder for name, q in REGISTRY.items()}


# the external driver runs the oracle side of its correctness gate at
# sf=0.01 (brief contract); storage-layer oracles (parquet_metadata)
# need that path as a SQL constant, carried as the __SF_DIR__ token.
# Overridable so deployments whose oracle corpus lives elsewhere don't
# hit parquet_metadata() on a nonexistent path.
DRIVER_ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def oracle_sql_map() -> dict[str, str]:
    return {
        name: q.oracle.replace("__SF_DIR__", DRIVER_ORACLE_SF_DIR)
        for name, q in REGISTRY.items()
        if q.oracle is not None
    }


def headline_queries() -> list[Query]:
    return [q for q in REGISTRY.values() if q.headline]

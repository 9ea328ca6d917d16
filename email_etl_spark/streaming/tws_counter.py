"""Arbitrary stateful streaming via transformWithStateInPandas
(Spark 4, SPARK-46815) — the successor API to applyInPandasWithState
used by streaming/sessionizer.py: typed per-key state handles
(value/list/map), timers, and TTL replace the single packed state
tuple. This module keeps a per-user running counter + running value
sum across micro-batches — the streaming twin of
`events.groupBy(user_id).agg(count, sum)` with state that survives
restarts via the checkpoint.

ENVIRONMENT GATE: transformWithState's driver-side state server
speaks protobuf; containers without the `google.protobuf` python
package (this one) cannot run it — `tws_available()` reports that,
the test suite skips accordingly, and streaming/sessionizer.py's
applyInPandasWithState path (no protobuf dependency) remains the
supported stateful operator here. On a normal cluster image
(protobuf ships with pyspark[connect]) this module runs as-is with
  spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider
(transformWithState supports only the RocksDB store).

State shape: ONE ValueState row per user (two longs), so state size
is bounded by the key cardinality, not the stream length; at 100 TB
/day the counter state for hundreds of millions of users is a few GB
across executors, exactly what the RocksDB state store is for.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_centi", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v_centi", LongType())]
)


class RunningCounter(StatefulProcessor):
    """Per-user (count, exact centi-unit sum) maintained in a
    ValueState; emits the updated totals for every user seen in the
    micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, v = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # exact integer centi-units (the registry money convention)
            v += int(round(float(pdf["value"].sum()) * 100))
        self._state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_centi": [v]}
        )

    def close(self) -> None:
        pass


def running_user_totals(events: DataFrame) -> DataFrame:
    """Wire the processor: one state row per user, update-mode output."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningCounter(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def tws_available() -> bool:
    """transformWithState needs the protobuf python package for its
    driver-worker channel; gate callers (import-try convention)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

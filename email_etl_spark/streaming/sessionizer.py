"""Custom stateful streaming operator (SURVEY.md §2.H):
gap-based sessionization with applyInPandasWithState.

The batch twin (plans/sessions.py::sessionize) closes sessions with
lag+running-sum windows; a stream can't, because a session stays open
across micro-batches. State per user_id carries the open session
(start, last_ts, count); a 30-minute event-time gap — or state timeout
once the watermark passes — closes it and emits a row.

This is the engine's template for operators Spark lacks natively:
keyed state + Arrow-batched pandas logic, emitting only finalized
results downstream.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": n,
                }
            ]
        )
        return

    ts_list = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = None
        n = 0

    closed = []
    for us in ts_list:
        if start_us is None:
            start_us = last_us = us
            n = 1
        elif us - last_us > SESSION_GAP_S * 1_000_000:
            closed.append((start_us, last_us, n))
            start_us = last_us = us
            n = 1
        else:
            last_us = us
            n += 1

    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_S * 1000)

    if closed:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(s, unit="us"),
                    "session_end": pd.Timestamp(e, unit="us"),
                    "n_events": cnt,
                }
                for s, e, cnt in closed
            ]
        )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events stream → finalized session rows (open sessions emit on
    gap or on event-time timeout)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Streaming EWMA anomaly flags (SURVEY.md §2.H): the stateful twin
of plans/timeseries.py::ewma_anomaly. The batch op computes the
8-day exponentially-weighted baseline with LAG windows; a stream
cannot look back across micro-batches, so per-series state carries
exactly the 8 trailing daily counts the batch window would read —
the "same 8-value state" the batch docstring promises.

Integer weights are imported from the batch op (3^(j-1)*4^(8-j),
den = 4^8-3^8), so a day flagged by the stream is flagged by the
batch plan bit-for-bit — proven by tests/test_streaming_anomaly.py,
which replays the same daily series through both paths.

Ordering contract: the upstream daily rollup emits days in event-time
order per series (the natural product of a watermark-closed tumbling
window); within a micro-batch, days are sorted before state replay.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from email_etl_spark.plans.timeseries import EWMA_DEN, EWMA_W

OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("n", T.LongType()),
        T.StructField("baseline", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)

# lags[0] = yesterday ... lags[7] = 8 days ago
STATE_SCHEMA = T.StructType([T.StructField(f"l{j}", T.LongType()) for j in range(1, 9)])


def _ewma_group(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    (series,) = key
    if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
        state.remove()
        return

    rows = []
    for pdf in pdfs:
        rows.extend(zip(pdf["d"], pdf["n"]))
    rows.sort(key=lambda r: r[0])

    lags = list(state.get) if state.exists else [None] * 8
    out = []
    for d, n in rows:
        n = int(n)
        if all(v is not None for v in lags):
            ew = sum(EWMA_W[j] * lags[j] for j in range(8))
            baseline = ew // EWMA_DEN
            if n * EWMA_DEN > 2 * ew:
                status = "spike"
            elif 2 * n * EWMA_DEN < ew:
                status = "drop"
            else:
                status = "normal"
            out.append(
                {"series": series, "d": d, "n": n, "baseline": baseline, "status": status}
            )
        lags = [n] + lags[:7]

    state.update(tuple(lags))
    if out:
        yield pd.DataFrame(out)


def ewma_anomaly_stream(daily: DataFrame) -> DataFrame:
    """(series, d, n) daily-count stream → flagged days once each
    series has its 8-day warmup — per-series keyed state, Arrow
    batches, append output (the sessionizer template)."""
    return daily.groupBy("series").applyInPandasWithState(
        _ewma_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_ewma_stream(
    spark: SparkSession, daily_dir: str, checkpoint_dir: str, schema: str | None = None
) -> list:
    """availableNow file-source run over parquet daily-count chunks;
    returns the flagged rows (driver-side, eval scale)."""
    src = (
        spark.readStream.schema(schema or "series string, d date, n bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(daily_dir)
    )
    flagged = ewma_anomaly_stream(src)
    q = (
        flagged.writeStream.format("memory")
        .queryName("ewma_anomaly_stream")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM ewma_anomaly_stream").collect()

"""Streaming EWMA anomaly flags must equal the batch twin
(plans/timeseries.py::ewma_anomaly) on the same daily series —
the stream's 8-value keyed state IS the batch LAG window."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from email_etl_spark.io import load_table
from email_etl_spark.plans.registry import REGISTRY
from email_etl_spark.streaming.anomaly import run_ewma_stream

SF = "/root/testdata/sf0.001"


def _write_chunk(spark, src_dir: str, rows, name: str) -> None:
    df = spark.createDataFrame(rows, "series string, d date, n bigint")
    stage = os.path.join(src_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(stage)


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "daily")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    daily = (
        load_table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("d")
        .collect()
    )
    rows = [("all", r["d"], r["n"]) for r in daily]
    # three chronological drops — the stream must carry its 8-value
    # state across micro-batch boundaries (maxFilesPerTrigger=1)
    third = len(rows) // 3
    _write_chunk(spark, src, rows[:third], "c0")
    _write_chunk(spark, src, rows[third : 2 * third], "c1")
    _write_chunk(spark, src, rows[2 * third :], "c2")

    got = {
        (r["d"], r["n"], r["baseline"], r["status"])
        for r in run_ewma_stream(spark, src, ck)
    }
    want = {
        (r["d"], r["n"], r["baseline"], r["status"])
        for r in REGISTRY["ewma_anomaly"].builder(spark, SF).collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_is_per_series_keyed(spark, tmp_path):
    """Two interleaved series must keep independent 8-value states."""
    src = str(tmp_path / "daily2")
    ck = str(tmp_path / "ck2")
    os.makedirs(src)

    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    rows = []
    for i in range(12):
        rows.append(("flat", d0 + dt.timedelta(days=i), 100))
        rows.append(("spiky", d0 + dt.timedelta(days=i), 100 if i < 11 else 1000))
    _write_chunk(spark, src, rows, "c0")

    out = run_ewma_stream(spark, src, ck)
    by_series = {}
    for r in out:
        by_series.setdefault(r["series"], []).append(r)
    # warmup = 8 days -> days 9..12 emit for both series
    assert {len(v) for v in by_series.values()} == {4}
    assert all(r["status"] == "normal" for r in by_series["flat"])
    last_spiky = max(by_series["spiky"], key=lambda r: r["d"])
    assert last_spiky["status"] == "spike"
    assert last_spiky["baseline"] == 100

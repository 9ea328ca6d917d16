"""foreachBatch streaming upsert: latest-row-per-key store semantics
must match the batch upsert (reference INSERT ... ON CONFLICT,
src/database.py:84-130)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from email_etl_spark.streaming.pipeline import events_stream, run_upsert_stream


def _write_drop(spark, src_dir: str, rows, name: str) -> None:
    """Materialize one parquet FILE into the watched directory (the
    file stream source lists files, not nested dataset dirs)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    stage = os.path.join(src_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(stage)


def test_upsert_stream_keeps_latest_per_key(spark, tmp_path):
    src = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    from datetime import datetime

    t = lambda s: datetime.fromisoformat(s)
    _write_drop(
        spark,
        src,
        [
            (1, t("2024-01-01T10:00:00"), 7, "login", 1.0, "{}"),
            (2, t("2024-01-01T11:00:00"), 7, "click", 2.0, "{}"),
            (3, t("2024-01-01T09:00:00"), 8, "login", 3.0, "{}"),
        ],
        "d1",
    )
    run_upsert_stream(events_stream(spark, src), store, ck, key="user_id")
    got = {r["user_id"]: r["event_id"] for r in spark.read.parquet(store).collect()}
    assert got == {7: 2, 8: 3}  # latest ts per key wins

    # second drop: newer row for 7, older (late) row for 8, new key 9
    _write_drop(
        spark,
        src,
        [
            (4, t("2024-01-01T12:00:00"), 7, "buy", 4.0, "{}"),
            (5, t("2024-01-01T08:00:00"), 8, "stale", 5.0, "{}"),
            (6, t("2024-01-01T10:30:00"), 9, "login", 6.0, "{}"),
        ],
        "d2",
    )
    run_upsert_stream(events_stream(spark, src), store, ck, key="user_id")
    got = {r["user_id"]: r["event_id"] for r in spark.read.parquet(store).collect()}
    # 7 upgraded to the newer row, 8 kept (late row loses), 9 inserted
    assert got == {7: 4, 8: 3, 9: 6}


def test_upsert_stream_recovers_interrupted_swap(spark, tmp_path):
    """Crash between rename(store->old) and rename(tmp->store) must not
    lose the previously upserted keys: the parked .old copy is the
    authoritative store and is restored before the retry merges."""
    src = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    from datetime import datetime

    t = lambda s: datetime.fromisoformat(s)
    _write_drop(
        spark,
        src,
        [(1, t("2024-01-01T10:00:00"), 7, "login", 1.0, "{}")],
        "d1",
    )
    run_upsert_stream(events_stream(spark, src), store, ck, key="user_id")
    # simulate the interrupted swap window
    shutil.move(store, store + ".old")
    assert not os.path.isdir(store)

    _write_drop(
        spark,
        src,
        [(2, t("2024-01-01T11:00:00"), 9, "click", 2.0, "{}")],
        "d2",
    )
    run_upsert_stream(events_stream(spark, src), store, ck, key="user_id")
    got = {r["user_id"]: r["event_id"] for r in spark.read.parquet(store).collect()}
    # key 7 survived the simulated crash; key 9 merged on top
    assert got == {7: 1, 9: 2}
    assert not os.path.isdir(store + ".old")


def test_cdc_stream_applies_deletes_and_blocks_resurrection(spark, tmp_path):
    """The streaming CDC twin of the batch cdc_apply: a tombstone
    removes the key from served state, and an out-of-order upsert
    OLDER than the tombstone (arriving in a later micro-batch) must
    NOT resurrect it — the persisted tombstone wins the keep-latest
    merge."""
    from email_etl_spark.streaming.pipeline import read_cdc_state, run_cdc_stream

    src = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    from datetime import datetime

    t = lambda s: datetime.fromisoformat(s)
    _write_drop(
        spark,
        src,
        [
            (1, t("2024-01-01T10:00:00"), 7, "login", 1.0, "{}"),
            (2, t("2024-01-01T11:00:00"), 7, "error", 2.0, "{}"),  # tombstone for 7
            (3, t("2024-01-01T09:00:00"), 8, "login", 3.0, "{}"),
        ],
        "d1",
    )
    run_cdc_stream(events_stream(spark, src), store, ck, key="user_id")
    assert {r["user_id"] for r in read_cdc_state(spark, store).collect()} == {8}
    # the tombstone row itself is retained in the physical store
    assert {r["user_id"]: r["op"] for r in spark.read.parquet(store).collect()} == {7: "D", 8: "U"}

    # late batch: upsert for 7 OLDER than its tombstone (stays dead),
    # delete for 8, fresh insert for 9
    _write_drop(
        spark,
        src,
        [
            (4, t("2024-01-01T10:30:00"), 7, "click", 4.0, "{}"),
            (5, t("2024-01-01T12:00:00"), 8, "error", 5.0, "{}"),
            (6, t("2024-01-01T10:00:00"), 9, "login", 6.0, "{}"),
        ],
        "d2",
    )
    run_cdc_stream(events_stream(spark, src), store, ck, key="user_id")
    state = {r["user_id"]: r["event_id"] for r in read_cdc_state(spark, store).collect()}
    assert state == {9: 6}  # 7 stays deleted, 8 now deleted, 9 live

    # a genuinely NEWER upsert for 7 does resurrect it (delete is an
    # op in the log, not a permanent ban)
    _write_drop(
        spark,
        src,
        [(7, t("2024-01-01T13:00:00"), 7, "login", 7.0, "{}")],
        "d3",
    )
    run_cdc_stream(events_stream(spark, src), store, ck, key="user_id")
    state = {r["user_id"]: r["event_id"] for r in read_cdc_state(spark, store).collect()}
    assert state == {7: 7, 9: 6}


def test_cdc_stream_state_matches_duckdb_oracle(spark, tmp_path):
    """End-to-end CORRECTNESS-style gate for the streaming CDC path
    (VERDICT r4 item 9): deliver the REAL sf0.001 events table as three
    out-of-order file drops through run_cdc_stream, then compare the
    served state (read_cdc_state) against the same DuckDB oracle
    discipline the batch cdc_apply query uses — row count + sorted
    schema + order-insensitive canonical values. A key's served row
    must be its highest-(ts, event_id) op, and only if that op is an
    upsert; tombstone retention across micro-batch boundaries is what
    this exercises that the batch twin cannot."""
    import duckdb

    from email_etl_spark.io import load_table
    from email_etl_spark.streaming.pipeline import (
        events_stream,
        read_cdc_state,
        run_cdc_stream,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle import canonical_rows

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    # three interleaved drops: event_id mod 3 scatters each user's ops
    # across micro-batches in non-chronological order, so cross-batch
    # keep-latest merges AND out-of-order upserts older than a standing
    # tombstone both occur on real data
    for part in range(3):
        rows = [tuple(r) for r in ev.where(F.col("event_id") % 3 == part).collect()]
        _write_drop(spark, src, rows, f"d{part}")
    run_cdc_stream(events_stream(spark, src), store, ck, key="user_id")

    got = read_cdc_state(spark, store).select("user_id", "event_id", "value")
    s_cols, s_rows = got.columns, [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    cur = con.execute(
        """
WITH log AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, value FROM log WHERE rn = 1 AND op = 'U'
"""
    )
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canonical_rows(s_cols, s_rows) == canonical_rows(o_cols, o_rows)

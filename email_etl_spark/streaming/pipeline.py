"""Structured-streaming twins of the batch pipelines (SURVEY.md §2.H).

The reference's incremental sync (ref: src/etl_pipeline.py:233-245)
polls for messages newer than a stored watermark. In Spark the same
semantics are a file-source stream: new parquet drops are discovered
per micro-batch, event-time watermarks bound state, and windowed
aggregation replaces the ad-hoc max(date) bookkeeping.

Tests run with trigger(availableNow=True) so a bounded corpus drains
deterministically; a production job just switches the trigger and
sink — the plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a DIRECTORY of events parquet drops
    (Spark's file stream source discovers new files per micro-batch;
    single-file paths are rejected). Schema comes from a batch read of
    the same directory; the ns→µs timestamp conversion matches
    io.load_table."""
    from email_etl_spark.io import _ensure_confs

    _ensure_confs(spark)
    raw_schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(raw_schema).parquet(events_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # event-time watermarks require TIMESTAMP (LTZ); the session tz
        # is pinned UTC by _ensure_confs so this cast is a pure retag
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with a late-data
    watermark — the streaming twin of the batch `tumbling_counts`
    query (plans/sessions.py). State is bounded: windows older than
    the watermark are finalized and dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def session_windowed_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session aggregation through Spark's NATIVE
    session_window streaming aggregate — the declarative sibling of
    the custom applyInPandasWithState sessionizer
    (streaming/sessionizer.py): gap-based windows merge inside the
    aggregation operator, the watermark finalizes (and drops) a
    session once event time passes its end + allowed lateness, so
    state is bounded by open sessions only. Emits one row per closed
    session; the batch twin is plans/sessions.session_window_stats
    (same operator, batch mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def incremental_sink(df: DataFrame, out_dir: str, checkpoint_dir: str) -> DataStreamWriter:
    """Append sink with checkpointing — exactly-once file output, the
    durable replacement for the reference's audit-log bookkeeping."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )



def _await_drained(q, what: str, timeout_s: int = 300) -> None:
    """awaitTermination with the timeout ENFORCED: a hung or slow
    availableNow drain must fail loudly instead of handing back a
    partially populated store/memory table (awaitTermination returns
    False on timeout; ignoring it surfaces later as a confusing
    downstream assertion mismatch)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"availableNow drain of {what!r} exceeded {timeout_s} s")


def run_available_now(df: DataFrame, checkpoint_dir: str) -> list:
    """Drain the bounded stream into memory (complete mode) and return
    the rows — test harness path."""
    q = (
        df.writeStream.format("memory")
        .queryName("windowed_counts_test")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, "windowed_counts_test")
    spark = df.sparkSession
    return spark.sql("SELECT * FROM windowed_counts_test").collect()


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on the message identity — the streaming
    twin of the reference's skip-already-imported check (ref:
    src/etl_pipeline.py:112-118): re-delivered drops (provider
    retries, overlapping syncs) are suppressed exactly once per
    watermark horizon. State is bounded by the watermark: an event_id
    is remembered only until event time passes beyond it, so state
    size tracks the duplicate-arrival window, not the corpus."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_available_now_append(df: DataFrame, checkpoint_dir: str, name: str) -> list:
    """Drain a bounded APPEND-mode stream into memory and return the
    rows — test harness path for stateful operators whose output is
    final-on-emit (dedup, sessionization)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, name)
    return df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def enriched_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the
    (broadcast) static dimension — the streaming analog of attaching
    provider/account metadata to the audit stream. Stream-static joins
    are stateless (no watermark needed on the static side) and the
    broadcast keeps per-batch work shuffle-free; Spark re-plans the
    static side per micro-batch, so a slowly-refreshed dim table is
    picked up on file change."""
    return events.join(F.broadcast(dim), key, "left")


def tiered_windowed_counts(
    events: DataFrame, dim: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed counts per enrichment tier — stream-static join feeding
    a watermarked tumbling aggregation (join is stateless, agg state is
    bounded by the watermark)."""
    return (
        enriched_stream(events, dim)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("tier"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "tier", "n_events")
    )


def error_context_join(errors: DataFrame, actions: DataFrame) -> DataFrame:
    """Stream-stream interval join: each error event joins the same
    user's non-error actions from the preceding hour — the streaming
    root-cause-context primitive (what was this user doing just before
    the failure?). Both sides carry watermarks and the join condition
    bounds event time from BOTH directions, so Spark can prove when a
    buffered row can never match again and evict it: state is
    O(one hour of traffic per side), not unbounded. Pass the same
    source stream filtered two ways; Spark plans one scan feeding both
    join inputs."""
    e = errors.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    ).withWatermark("error_ts", "2 hours")
    a = actions.select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("action_ts"),
        F.col("event_type").alias("action_type"),
    ).withWatermark("action_ts", "2 hours")
    return e.join(
        a,
        (F.col("e_user") == F.col("a_user"))
        & (F.col("action_ts") >= F.col("error_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("action_ts") < F.col("error_ts")),
    ).select("error_id", "e_user", "error_ts", "action_type", "action_ts")


def run_upsert_stream(
    events: DataFrame, store_dir: str, checkpoint_dir: str, key: str = "user_id"
) -> None:
    """Streaming keyed UPSERT via foreachBatch — the streaming twin of
    the reference's INSERT ... ON CONFLICT keep-latest (upsert by
    message_id, src/database.py:84-130) and of the batch
    `upsert_latest` query.

    Each micro-batch: reduce the batch to its latest row per key
    (window by ts desc), merge against the current store with a
    full-outer keep-latest, and swap the store via rename. The merged
    result is written to a TEMP SIBLING directory and renamed over the
    store (previous store parked at `<store>.old` until the swap
    lands, restored on the next run if a crash interrupts the swap) —
    overwriting the store in place would delete the old data before
    the new write finishes, so a crash mid-write would truncate the
    store and a checkpointed batch retry would then merge against
    nothing. Writing to a sibling also means the lazy merge plan reads
    the old store while the new one is written: no self-overwrite, no
    defensive cache/materialize. On a real deployment the store is a
    Delta/Iceberg table and the merge is `MERGE INTO`
    (partition-pruned, no full rewrite, transactional log instead of
    the rename dance); plain parquet here keeps the container
    dependency-free while exercising the identical foreachBatch seam
    and merge semantics. availableNow makes the same code a bounded
    backfill runner."""
    import os
    import shutil

    from pyspark.sql import Window

    old_dir = store_dir.rstrip("/") + ".old"

    def restore_if_interrupted() -> None:
        # crash landed between rename(store->old) and rename(tmp->store):
        # the parked copy is the authoritative store
        if not os.path.isdir(store_dir) and os.path.isdir(old_dir):
            os.rename(old_dir, store_dir)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        restore_if_interrupted()
        w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        )
        if os.path.isdir(store_dir) and any(
            f.endswith(".parquet") for f in os.listdir(store_dir)
        ):
            cur = spark.read.parquet(store_dir)
            merged = (
                cur.unionByName(latest)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = latest
        # stage-then-swap: foreachBatch may retry a batch, so the write
        # must be idempotent — never append, never overwrite in place
        tmp_dir = store_dir.rstrip("/") + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp_dir)
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(store_dir):
            os.rename(store_dir, old_dir)
        os.rename(tmp_dir, store_dir)
        shutil.rmtree(old_dir, ignore_errors=True)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, "upsert_store_merge")


def run_cdc_stream(
    events: DataFrame, store_dir: str, checkpoint_dir: str, key: str = "user_id"
) -> None:
    """Streaming CDC apply with DELETE semantics — the streaming twin
    of the batch `cdc_apply` query (plans/governance.py) and the
    tombstone extension of `run_upsert_stream`: event_type 'error' is
    read as a DELETE op, everything else as an UPSERT, and a key's
    state is the op with the highest (ts, event_id).

    Tombstones are RETAINED as store rows (op='D') rather than
    dropping the key: a later micro-batch can deliver an out-of-order
    upsert OLDER than the delete, and only a persisted tombstone makes
    the keep-latest merge reject it — dropping tombstones would
    silently resurrect deleted keys. Readers go through
    `read_cdc_state`, which filters op='D' (exactly how log-compacted
    CDC stores and Delta MERGE handle deletes). Tombstone GC —
    dropping op='D' rows older than the source's max replay horizon —
    is a compaction policy decision left to the store owner; the same
    stage-then-swap rename discipline as run_upsert_stream keeps every
    batch idempotent and crash-safe."""
    import os
    import shutil

    from pyspark.sql import Window

    old_dir = store_dir.rstrip("/") + ".old"
    tagged = events.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )

    def restore_if_interrupted() -> None:
        if not os.path.isdir(store_dir) and os.path.isdir(old_dir):
            os.rename(old_dir, store_dir)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        restore_if_interrupted()
        w = Window.partitionBy(key).orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        )
        if os.path.isdir(store_dir) and any(
            f.endswith(".parquet") for f in os.listdir(store_dir)
        ):
            cur = spark.read.parquet(store_dir)
            merged = (
                cur.unionByName(latest)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = latest
        tmp_dir = store_dir.rstrip("/") + f".tmp-{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp_dir)
        if os.path.isdir(old_dir):
            shutil.rmtree(old_dir)
        if os.path.isdir(store_dir):
            os.rename(store_dir, old_dir)
        os.rename(tmp_dir, store_dir)
        shutil.rmtree(old_dir, ignore_errors=True)

    q = (
        tagged.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, "cdc_store_merge")


def read_cdc_state(spark: SparkSession, store_dir: str) -> DataFrame:
    """Live CDC state: the store minus tombstones (op='D' rows are
    retained for out-of-order protection, never served)."""
    return spark.read.parquet(store_dir).where(F.col("op") != "D")


def run_available_now_update(df: DataFrame, checkpoint_dir: str, name: str) -> list:
    """Drain a bounded UPDATE-mode stream into memory and return the
    rows — test harness path for transformWithState processors that
    re-emit a key's latest value each micro-batch."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, name)
    return df.sparkSession.sql(f"SELECT * FROM {name}").collect()

"""Parquet footer data-skipping contract (SURVEY §4): per-row-group
min/max statistics must reproduce pyarrow ground truth, and the skip
decision for a predicate window must match exact row membership on a
crafted multi-row-group file."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chunked_file(tmp_path_factory):
    """60 rows over 6 row groups of 10, ts strictly increasing by day
    — row-group min/max windows are disjoint, so skipping is exact."""
    import datetime as dt

    path = str(tmp_path_factory.mktemp("meta") / "events_chunked.parquet")
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(days=i) for i in range(60)]
    table = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "v": list(range(60))})
    pq.write_table(table, path, row_group_size=10)
    return path


def test_rowgroup_stats_match_pyarrow(spark, chunked_file):
    from email_etl_spark.operators.metadata import parquet_rowgroup_stats

    got = parquet_rowgroup_stats(spark, [chunked_file], "ts").orderBy("rg_idx").collect()
    md = pq.ParquetFile(chunked_file).metadata
    assert len(got) == md.num_row_groups == 6
    for row in got:
        st = md.row_group(row.rg_idx).column(0).statistics
        assert row.n_rows == 10
        assert row.stat_min == str(st.min) and row.stat_max == str(st.max)


def test_skip_decision_matches_exact_membership(spark, chunked_file):
    """A [lo, hi] window must mark exactly the row groups with no
    overlapping rows as skippable."""
    from email_etl_spark.operators.metadata import parquet_rowgroup_stats

    from email_etl_spark.operators.metadata import skippable_outside_window

    lo, hi = "2024-01-25", "2024-02-05"  # overlaps row groups 2 and 3
    stats = parquet_rowgroup_stats(spark, [chunked_file], "ts")
    skippable = skippable_outside_window(lo, hi)
    got = {
        r.rg_idx: r.skip
        for r in stats.select("rg_idx", skippable.alias("skip")).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: False, 4: True, 5: True}


def test_skip_decision_inclusive_hi_day(spark, tmp_path):
    """A row group whose min timestamp falls MID-DAY on the hi date
    overlaps an inclusive [lo, hi] day window and must NOT be marked
    skippable — the naive lexicographic compare against the bare hi
    date string classified it skippable ('2024-01-20 13:00:00' >
    '2024-01-20'); midnight-aligned fixtures masked this."""
    import datetime as dt

    from email_etl_spark.operators.metadata import (
        parquet_rowgroup_stats,
        skippable_outside_window,
    )

    path = str(tmp_path / "midday.parquet")
    ts = [
        dt.datetime(2024, 1, 20, 13, 0, 0),   # rg 0: entirely on hi day, after midnight
        dt.datetime(2024, 1, 20, 18, 30, 0),
        dt.datetime(2024, 1, 21, 1, 0, 0),    # rg 1: entirely after the window
        dt.datetime(2024, 1, 21, 2, 0, 0),
    ]
    table = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "v": [1, 2, 3, 4]})
    pq.write_table(table, path, row_group_size=2)
    stats = parquet_rowgroup_stats(spark, [path], "ts")
    got = {
        r.rg_idx: r.skip
        for r in stats.select(
            "rg_idx", skippable_outside_window("2024-01-10", "2024-01-20").alias("skip")
        ).collect()
    }
    assert got == {0: False, 1: True}


def test_registry_query_runs_on_testdata(spark):
    from email_etl_spark.plans.registry import REGISTRY

    rows = REGISTRY["parquet_skipping_stats"].builder(spark, SF_SMOKE).collect()
    # single small file -> one row group, overlapping the window
    assert len(rows) >= 1
    assert all(r.n_rows > 0 for r in rows)
    assert rows[0].skippable is False


def test_observe_counters_ride_the_action(spark):
    """observe() metrics must match a ground-truth aggregate while
    costing zero extra scans (they accumulate inside the one action)."""
    from email_etl_spark.io import load_table, observe_counters

    docs = load_table(spark, SF_SMOKE, "documents")
    out, obs = observe_counters(
        docs,
        "ingest_quality",
        n_rows=F.count(F.lit(1)),
        n_en=F.sum((F.col("lang") == "en").cast("long")),
        total_chars=F.sum("n_chars"),
    )
    n_out = out.where(F.length("text") >= 0).count()  # the ONE action
    m = obs.get
    truth = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lang") == "en").cast("long")).alias("en"),
        F.sum("n_chars").alias("c"),
    ).first()
    assert m["n_rows"] == truth["n"] == n_out
    assert m["n_en"] == truth["en"]
    assert m["total_chars"] == truth["c"]


def test_stat_strings_canonical_across_engines(spark, tmp_path):
    """Row groups whose min/max micros end in 0 stringify differently
    per engine (DuckDB trims trailing fractional zeros, pyarrow's
    str(datetime) pads to 6 digits); the query + oracle share a trim
    canonicalization so the gate compares values, not formatting."""
    import datetime as dt

    import duckdb

    path = str(tmp_path / "zeromicros.parquet")
    ts = [
        dt.datetime(2024, 1, 11, 13, 0, 0, 500000),   # '.500000' vs '.5'
        dt.datetime(2024, 1, 12, 13, 0, 0, 120000),   # '.120000' vs '.12'
        dt.datetime(2024, 1, 13, 13, 0, 0, 0),        # no frac on either side
        dt.datetime(2024, 1, 14, 13, 0, 0, 123456),   # full 6 digits, no trim
    ]
    table = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "v": [1, 2, 3, 4]})
    pq.write_table(table, path, row_group_size=2)

    def trim_frac(c):
        return F.regexp_replace(
            F.regexp_replace(c, r"(\.\d*?)0+$", "$1"), r"\.$", ""
        )

    from email_etl_spark.operators.metadata import parquet_rowgroup_stats

    got = {
        r.rg_idx: (r.lo, r.hi)
        for r in parquet_rowgroup_stats(spark, [path], "ts")
        .select(
            "rg_idx",
            trim_frac(F.col("stat_min")).alias("lo"),
            trim_frac(F.col("stat_max")).alias("hi"),
        )
        .collect()
    }
    oracle = {
        rg: (lo, hi)
        for rg, lo, hi in duckdb.sql(
            f"""
            SELECT row_group_id,
                   regexp_replace(regexp_replace(stats_min_value,
                       '(\\.\\d*?)0+$', '\\1'), '\\.$', ''),
                   regexp_replace(regexp_replace(stats_max_value,
                       '(\\.\\d*?)0+$', '\\1'), '\\.$', '')
            FROM parquet_metadata('{path}') WHERE path_in_schema = 'ts'
            """
        ).fetchall()
    }
    assert got == oracle
    assert got[0] == ("2024-01-11 13:00:00.5", "2024-01-12 13:00:00.12")
    assert got[1] == ("2024-01-13 13:00:00", "2024-01-14 13:00:00.123456")

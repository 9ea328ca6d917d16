"""Edge-case units for the temporal joins (plans/temporal.py) — the
parity tests check corpus behavior; these pin the boundary semantics
with crafted rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _run_asof(spark, rows):
    import email_etl_spark.plans.temporal as tmod

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    orig = tmod.load_table
    tmod.load_table = lambda s, d, n: df
    try:
        return {r.purchase_id: r for r in tmod.asof_join(spark, "ignored").collect()}
    finally:
        tmod.load_table = orig


def test_asof_tie_and_no_prior(spark):
    rows = [
        # user 1: login at :05, purchase at :05 (same instant) → tie matches
        (1, _ts(5), 1, "login"),
        (2, _ts(5), 1, "purchase"),
        # user 2: purchase with NO prior event → null prior columns
        (3, _ts(10), 2, "purchase"),
        # user 3: two candidates at the same ts → max event_id wins
        (4, _ts(1), 3, "view"),
        (5, _ts(1), 3, "click"),
        (6, _ts(2), 3, "purchase"),
        # user 3: later event after the purchase must NOT match
        (7, _ts(3), 3, "login"),
    ]
    got = _run_asof(spark, rows)
    assert got[2].prior_event_id == 1 and got[2].prior_type == "login"
    assert got[3].prior_event_id is None and got[3].prior_type is None
    assert got[6].prior_event_id == 5 and got[6].prior_type == "click"


def test_range_join_boundaries(spark):
    import email_etl_spark.plans.temporal as tmod

    rows = [
        # error at minute 40; window = [minute 10, minute 40)
        (1, _ts(40), 1, "error"),
        (2, _ts(10), 1, "view"),      # exactly at lower bound → IN
        (3, _ts(40), 1, "click"),     # exactly at error ts → OUT (half-open)
        (4, _ts(9, 59), 1, "view"),   # just before lower bound → OUT
        (5, _ts(39), 1, "view"),      # inside → IN
        (6, _ts(39), 2, "view"),      # other user → OUT
        # error with nothing around it
        (7, _ts(50), 3, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    orig = tmod.load_table
    tmod.load_table = lambda s, d, n: df
    try:
        got = {r.error_id: r.n_prior_30m for r in tmod.range_join_count(spark, "x").collect()}
    finally:
        tmod.load_table = orig
    assert got == {1: 2, 7: 0}

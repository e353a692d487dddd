"""Temporal KG validity intervals: run-collapse semantics golden."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _q(spark, rows):
    """Run the kg_temporal_intervals transformation on an in-memory events
    frame by monkey-loading it through a temp view-compatible shape."""
    from i2o_transform_spark.queries import QUERIES
    import tempfile, os

    d = tempfile.mkdtemp(prefix="tmp_events_")
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string"
    )
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return QUERIES["kg_temporal_intervals"](spark, d)


def test_runs_collapse_and_close_on_change(spark):
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    # user 1 / 'view': obj run 0,0 then 1 then 0 again -> three intervals
    rows = [
        (0, t(0), 1, "view", 0.0, "{}"),
        (1, t(10), 1, "view", 0.5, "{}"),   # floor 0 -> same run
        (2, t(20), 1, "view", 1.0, "{}"),   # obj 1 -> new run
        (3, t(30), 1, "view", 3.0, "{}"),   # floor 3 % 3 = 0 -> new run
        (4, t(5), 2, "click", 2.0, "{}"),   # other key, single open run
    ]
    got = {
        (r["subj"], r["pred"], r["valid_from_us"]): (
            r["obj"], r["valid_to_us"], r["n_assertions"]
        )
        for r in _q(spark, rows).collect()
    }
    us = lambda s: int(dt.datetime(  # noqa: E731
        2024, 1, 1, 0, 0, s, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got == {
        (1, "view", us(0)): (0, us(20), 2),
        (1, "view", us(20)): (1, us(30), 1),
        (1, "view", us(30)): (0, None, 1),
        (2, "click", us(5)): (2, None, 1),
    }


def test_single_exchange_plan(spark):
    rows = [(0, dt.datetime(2024, 1, 1), 1, "view", 0.0, "{}")]
    df = _q(spark, rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_snapshot_picks_covering_interval(spark):
    import os
    import tempfile

    from i2o_transform_spark.queries import _ASOF_T_US, QUERIES

    base = dt.datetime(2024, 1, 10)
    after = dt.datetime(2024, 1, 20)
    rows = [
        # user 1 'view': obj 0 from Jan-10, flips to 1 on Jan-20
        (0, base, 1, "view", 0.0, "{}"),
        (1, after, 1, "view", 1.0, "{}"),
        # user 2 'view': first assertion AFTER T -> absent as of T
        (2, after, 2, "view", 2.0, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="tmp_events_")
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string"
    )
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {(r.subj, r.pred): r.obj
           for r in QUERIES["kg_asof_snapshot"](spark, d).collect()}
    # T (Jan-16) falls inside user 1's first interval only
    assert got == {(1, "view"): 0}
    assert dt.datetime(2024, 1, 16).timestamp() * 1e6 == _ASOF_T_US

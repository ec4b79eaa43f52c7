"""Time-series regularization: LOCF and linear interpolation on a
hand-computed fixture (gaps, edges, multiple keys)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.timeseries import (
    daily_observations,
    interpolate_linear,
    resample_locf,
)


def _obs(spark):
    # key a: days 1 and 5 observed (10.0 -> 30.0); key b: only day 3
    rows = [
        ("a", dt.datetime(2024, 1, 1, 9), 10.0),
        ("a", dt.datetime(2024, 1, 1, 15), 10.0),
        ("a", dt.datetime(2024, 1, 5, 12), 30.0),
        ("b", dt.datetime(2024, 1, 3, 8), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    return daily_observations(df, "k", "ts", "value")


def test_daily_observations_average_per_day(spark):
    got = {(r["k"], str(r["d"])): r["v"] for r in _obs(spark).collect()}
    assert got == {
        ("a", "2024-01-01"): 10.0,
        ("a", "2024-01-05"): 30.0,
        ("b", "2024-01-03"): 7.0,
    }


def test_locf_fills_forward_and_leaves_prehistory_null(spark):
    got = {
        (r["k"], str(r["d"])): r["locf"]
        for r in resample_locf(_obs(spark)).collect()
    }
    # spine spans global bounds Jan 1..5 for BOTH keys
    assert len(got) == 10
    assert got[("a", "2024-01-03")] == 10.0  # carried
    assert got[("a", "2024-01-05")] == 30.0
    assert got[("b", "2024-01-01")] is None  # before first obs
    assert got[("b", "2024-01-05")] == 7.0  # carried


def test_linear_interpolation_fills_line_and_flat_edges(spark):
    got = {
        (r["k"], str(r["d"])): r["v_interp"]
        for r in interpolate_linear(_obs(spark)).collect()
    }
    # a: 10 .. 30 over 4 days -> +5/day
    assert got[("a", "2024-01-02")] == pytest.approx(15.0)
    assert got[("a", "2024-01-03")] == pytest.approx(20.0)
    assert got[("a", "2024-01-04")] == pytest.approx(25.0)
    # b: single observation extends flat both directions
    assert got[("b", "2024-01-01")] == pytest.approx(7.0)
    assert got[("b", "2024-01-05")] == pytest.approx(7.0)


def test_spine_bounds_relation_is_broadcast(spark):
    """The global-bounds cross join must plan as a broadcast of the
    1-row relation, never a shuffled cross product. (Window
    partitioning is covered by the registry-wide no-global-window
    gate, since ts1/ts2 are registered queries.)"""
    plan = (
        resample_locf(_obs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan

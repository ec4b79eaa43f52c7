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


def test_exact_median_two_pass_edge_cases(spark):
    from mcyj_datapipeline_spark.operators.aggregates import (
        exact_median_two_pass,
    )

    def med(vals, buckets=8):
        df = spark.createDataFrame([(float(v),) for v in vals], "x double")
        r = exact_median_two_pass(df, "x", buckets=buckets).collect()[0]
        return r["n_rows"], r["median"]

    assert med([5]) == (1, 5.0)
    assert med([1, 2, 3]) == (3, 2.0)
    assert med([1, 2, 3, 4]) == (4, 2.5)          # even: interpolate
    assert med([7, 7, 7, 7]) == (4, 7.0)          # all equal shortcut
    assert med([1, 1, 1, 100]) == (4, 1.0)        # duplicates at rank
    assert med(range(1, 1001), buckets=4) == (1000, 500.5)
    # empty input
    df = spark.createDataFrame([], "x double")
    r = exact_median_two_pass(df, "x").collect()[0]
    assert (r["n_rows"], r["median"]) == (0, None)


def test_exact_median_matches_percentile_on_random_data(spark):
    import random

    from mcyj_datapipeline_spark.operators.aggregates import (
        exact_median_two_pass,
    )

    rng = random.Random(3)
    vals = [round(rng.uniform(-1000, 1000), 2) for _ in range(2001)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_median_two_pass(df, "x", buckets=64).collect()[0]["median"]
    assert got == sorted(vals)[1000]


def test_exact_median_skewed_middle_bin_stays_bounded(spark):
    """ADVICE item: near-constant values plus one range-stretching
    outlier put ~all rows in one histogram bin. The narrowing loop
    must re-histogram within that bin instead of fetching n/2 rows
    through the driver — asserted by a max_fetch far below n — and
    still return the exact median."""
    import random

    from mcyj_datapipeline_spark.operators.aggregates import (
        exact_median_two_pass,
    )

    rng = random.Random(7)
    # 5000 values jittered in [100, 101), one outlier at 1e9: every
    # non-outlier lands in bin 0 of the first histogram
    vals = [100.0 + rng.random() for _ in range(5000)] + [1e9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_median_two_pass(
        df, "x", buckets=16, max_fetch=200
    ).collect()[0]
    assert got["n_rows"] == 5001
    assert got["median"] == sorted(vals)[2500]
    # plateau: duplicates so heavy no equal-width bin can split them —
    # the all-equal-candidates shortcut must fire, not an n/2 fetch
    vals2 = [42.0] * 4000 + [1.0, 99999.0]
    df2 = spark.createDataFrame([(v,) for v in vals2], "x double")
    got2 = exact_median_two_pass(
        df2, "x", buckets=8, max_fetch=100
    ).collect()[0]
    assert (got2["n_rows"], got2["median"]) == (4002, 42.0)

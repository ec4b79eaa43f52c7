"""Batch 16 semantic tests on crafted fixtures: gaps-and-islands merge
semantics, label-outlier detection geometry, and day-of-week anomaly
accounting. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.similarity import label_outliers
from mcyj_datapipeline_spark.operators.temporal import interval_islands


def _iv(spark, rows):
    df = spark.createDataFrame(rows, "k long, s_s long, e_s long")
    base = dt.datetime(2024, 1, 1)
    return df.select(
        "k",
        (F.lit(base) + F.make_interval(secs=F.col("s_s"))).alias("s"),
        (F.lit(base) + F.make_interval(secs=F.col("e_s"))).alias("e"),
    )


def test_islands_merge_overlap_and_touching_keep_gaps(spark):
    """[0,10] overlaps [5,20] (one island, 20s), [20,30] touches at the
    boundary (start == prev end -> NOT a new island under strict >),
    [40,50] is separate."""
    rows = [(1, 0, 10), (1, 5, 20), (1, 20, 30), (1, 40, 50)]
    [r] = interval_islands(_iv(spark, rows), "k", "s", "e").collect()
    assert r["n_islands"] == 2
    assert r["covered_ms"] == (30 - 0) * 1000 + (50 - 40) * 1000
    assert r["max_island_ms"] == 30_000


def test_islands_contained_interval_does_not_split(spark):
    """An interval fully inside a previous one must not end the island:
    [0,100], [10,20], [30,40] is ONE island of 100s — the running-max
    (not lag) formulation."""
    rows = [(1, 0, 100), (1, 10, 20), (1, 30, 40)]
    [r] = interval_islands(_iv(spark, rows), "k", "s", "e").collect()
    assert r["n_islands"] == 1 and r["covered_ms"] == 100_000


def test_islands_per_key_independent(spark):
    rows = [(1, 0, 10), (2, 0, 10), (2, 100, 110)]
    got = {
        r["k"]: r["n_islands"]
        for r in interval_islands(_iv(spark, rows), "k", "s", "e").collect()
    }
    assert got == {1: 1, 2: 2}


def test_label_outliers_flags_planted_mislabel(spark):
    """Two tight clusters on orthogonal axes; one vector sits in
    cluster B's position but carries label 0 — exactly that vector is
    flagged, with best_label 1 and positive delta."""
    rows = (
        [(i, 0, [1.0, 0.0]) for i in range(5)]
        + [(10 + i, 1, [0.0, 1.0]) for i in range(5)]
        + [(99, 0, [0.0, 1.0])]  # planted mislabel
    )
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = label_outliers(df).collect()
    assert [r["vec_id"] for r in out] == [99]
    [r] = out
    assert r["best_label"] == 1
    assert r["delta"] > 0
    assert r["best_cos"] > r["own_cos"]


def test_label_outliers_clean_labels_flag_nothing(spark):
    rows = [(i, 0, [1.0, 0.0]) for i in range(4)] + [
        (10 + i, 1, [0.0, 1.0]) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    assert label_outliers(df).count() == 0


def test_dow_anomaly_every_day_flagged_once_and_zero_var_is_false(spark):
    """The registry query's accounting: run it on sf0.001 and assert
    every day appears exactly once and zero-variance weekdays carry a
    definite False (never NULL) flag."""
    from mcyj_datapipeline_spark.registry_batch16 import ev_dow_anomaly

    rows = ev_dow_anomaly(spark, "/root/testdata/sf0.001").collect()
    days = [r["obs_day"] for r in rows]
    assert len(days) == len(set(days)) == 30
    for r in rows:
        assert r["is_anomaly"] in (True, False)
        if r["dow_std"] and r["dow_std"] > 0:
            assert r["abs_z"] is not None

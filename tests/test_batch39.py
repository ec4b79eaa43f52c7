"""Batch 39 tests: recursive-SQL surfaces, session_window TVF vs the
hand-built islands, mergeSchema null-fill semantics. Value parity vs
DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_recursive_spine_is_contiguous_and_complete(spark):
    """The generated spine covers min..max date with NO gaps, and the
    per-day totals sum to the event count (zero-filled days add 0)."""
    from mcyj_datapipeline_spark.registry_batch39 import (
        sql_recursive_date_spine,
    )

    rows = sorted(
        sql_recursive_date_spine(spark, SF).collect(), key=lambda r: r["d"]
    )
    assert rows
    for prev, cur in zip(rows, rows[1:]):
        assert (cur["d"] - prev["d"]).days == 1, "gap in the spine"
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).collect()[0]
    assert rows[0]["d"] == bounds["lo"] and rows[-1]["d"] == bounds["hi"]
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_recursive_ewma_matches_operator(spark):
    """The declarative recursive-SQL EWMA equals the grouped
    applyInPandas operator on the same day-grain series (same alpha,
    same 6dp stable rounding) — two independent execution paths, one
    recurrence."""
    from mcyj_datapipeline_spark.operators.sequential import ewma_per_key
    from mcyj_datapipeline_spark.registry_batch39 import sql_recursive_ewma

    sql_rows = {
        (r["event_type"], r["d"]): r["ewma"]
        for r in sql_recursive_ewma(spark, SF).collect()
    }
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    op = ewma_per_key(daily, ["event_type"], "d", "x", 0.25, "d")
    op_rows = {
        (r["event_type"], r["d"]): r["e"]
        for r in op.select(
            "event_type",
            "d",
            (
                F.floor(F.col("ewma") * 1000000.0 + 0.5) / 1000000.0
            ).alias("e"),
        ).collect()
    }
    assert sql_rows.keys() == op_rows.keys()
    for k in sql_rows:
        assert abs(sql_rows[k] - op_rows[k]) < 1e-6, k


def test_session_window_tvf_equals_islands(spark):
    """The engine-native session_window aggregation produces the same
    sessions as the lag/cumsum islands construction on a crafted
    trace with boundary-exact gaps."""
    from mcyj_datapipeline_spark.registry_batch39 import _SW_GAP_MIN

    D = dt.datetime
    trace = [
        # user 1: two sessions, the second starting EXACTLY at gap+1s
        (1, D(2024, 1, 1, 10, 0, 0)),
        (1, D(2024, 1, 1, 10, 29, 59)),
        (1, D(2024, 1, 1, 11, 0, 0)),
        # user 2: one long chained session (each step < gap)
        (2, D(2024, 1, 1, 9, 0, 0)),
        (2, D(2024, 1, 1, 9, 25, 0)),
        (2, D(2024, 1, 1, 9, 50, 0)),
    ]
    df = spark.createDataFrame(trace, "user_id long, ts timestamp")
    tvf = {
        (r["user_id"], r["s"], r["n"])
        for r in df.groupBy(
            "user_id",
            F.session_window("ts", f"{_SW_GAP_MIN} minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("sw.start").alias("s"), "n")
        .collect()
    }
    assert tvf == {
        (1, D(2024, 1, 1, 10, 0, 0), 2),
        (1, D(2024, 1, 1, 11, 0, 0), 1),
        (2, D(2024, 1, 1, 9, 0, 0), 3),
    }


def test_merge_schema_null_fills_missing_column(spark):
    """mergeSchema union: rows from the generation written without the
    priority column come back NULL there; rows from the newer
    generation keep values; row counts split exactly by the parity
    rule the generations were written with."""
    from mcyj_datapipeline_spark.registry_batch39 import (
        s18_merge_schema_union,
    )

    rows = s18_merge_schema_union(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    total = orders.count()
    odd = orders.filter(F.col("o_orderkey") % 2 == 1).count()
    assert sum(r["n"] for r in rows) == total
    assert sum(r["n_with_priority"] for r in rows) == odd
    assert all(r["n_with_priority"] <= r["n"] for r in rows)

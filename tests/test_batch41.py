"""Batch 41 semantic tests: prefix-merged HLL curve vs exact curve.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_hll_prefix_merge_curve_contract(spark):
    """The cumulative exact curve is monotone, ends at the corpus
    distinct-user count, every day's sketch estimate passes the 5%
    in-plan contract, and the curve matches a driver-side first-seen
    recompute."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.registry_batch41 import sk_hll_daily_merge

    rows = sorted(
        sk_hll_daily_merge(spark, SF).collect(), key=lambda r: r["day"]
    )
    assert rows
    assert all(r["within_bound"] for r in rows)
    cums = [r["cum_exact"] for r in rows]
    assert cums == sorted(cums)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert cums[-1] == ev.select("user_id").distinct().count()
    fs = {
        r["user_id"]: r["d"]
        for r in ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d"))
        .collect()
    }
    for r in rows:
        expect = sum(1 for d in fs.values() if d <= r["day"])
        assert r["cum_exact"] == expect, r["day"]

"""Batch 30 semantic tests: RFM segment accounting and Pareto curve
monotonicity. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_rfm_segments_account_for_all_customers(spark):
    """Every customer lands in exactly one segment; scores stay in
    1..5; segment sizes sum to the customer-with-orders universe."""
    from mcyj_datapipeline_spark.registry_batch30 import c3_rfm_segmentation

    rows = c3_rfm_segmentation(spark, SF).collect()
    assert rows
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert len(r["segment"]) == 3
        assert all(c in "12345" for c in r["segment"]), r
        assert r["n_customers"] > 0


def test_pareto_curve_is_monotone_and_complete(spark):
    """Shares sum to 1, the from-the-top cumulative decreases with
    decile... increases toward decile 10's own share — i.e. it is
    monotone DECREASING as deciles descend — and the top decile's
    share is at least the mean share (concentration)."""
    from mcyj_datapipeline_spark.registry_batch30 import (
        c4_pareto_concentration,
    )

    rows = sorted(
        c4_pareto_concentration(spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert rows
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    # cum_share_from_top at decile d = share of deciles >= d: decreasing in d
    cums = [r["cum_share_from_top"] for r in rows]
    assert cums == sorted(cums, reverse=True)
    assert abs(cums[0] - 1.0) < 1e-4
    top = rows[-1]
    assert top["share"] >= 1.0 / len(rows) - 1e-6

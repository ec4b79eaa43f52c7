"""Batch 44 semantic test: the hierarchical gap stitcher on a crafted
key set exercising all three levels. Value parity vs DuckDB runs in
test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_gap_audit_covers_every_hierarchy_level(spark, tmp_path):
    """Crafted keys force a gap INSIDE a bucket, a gap ACROSS buckets
    within one superbucket, and a gap ACROSS superbuckets (including
    fully-empty buckets in between); the hierarchical stitcher must
    report exactly the ranges a naive global scan would."""
    from mcyj_datapipeline_spark.registry_batch44 import (
        _GAP_BUCKET,
        _GAP_MIN_PRICE,
        dq10_sequence_gap_audit,
    )

    B = _GAP_BUCKET
    keys = [
        5, 9,                      # gap 6..8 inside bucket 0
        B - 1, B + 3,              # gap B..B+2 across buckets 0->1
        2 * B,                     # gap B+4..2B-1 across buckets 1->2
        B * B + 7,                 # gap across SUPERBUCKETS with many
    ]                              # empty buckets between
    import datetime as dt

    rows = [
        (k, float(_GAP_MIN_PRICE + 1), dt.date(2024, 1, 1)) for k in keys
    ]
    # decoys below the filter threshold must NOT plug gaps
    rows += [(7, float(_GAP_MIN_PRICE - 1), dt.date(2024, 1, 1))]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate date"
    )
    path = str(tmp_path / "orders.parquet")
    df.write.parquet(path)
    got = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in dq10_sequence_gap_audit(spark, str(tmp_path)).collect()
    )
    ks = sorted(keys)
    expect = sorted(
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b > a + 1
    )
    assert got == expect
    # all three stitch levels really fired
    assert (6, 8, 3) in got                      # within-bucket
    assert (B, B + 2, 3) in got                  # cross-bucket
    assert (2 * B + 1, B * B + 6, B * B - 2 * B + 6) in got  # cross-super

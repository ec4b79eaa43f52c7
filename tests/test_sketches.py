"""Sketch-operator tests: space-saving heavy hitters (exactness under
forced eviction, bounded candidate output) and bloom-bitmap merge
(merge == bitmap-of-union, the property that makes the screen
incremental across runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.sketches import (
    _space_saving_candidates,
    bloom_merge,
    heavy_hitters_topk,
)
from mcyj_datapipeline_spark.registry_batch7 import bloom_bitmap


def _zipf_df(spark):
    """Skewed corpus: token t{i} appears (50 - i) * 10 times for
    i in 0..49 — 50 distinct tokens, heavy head, known exact order."""
    rows = []
    for i in range(50):
        rows.extend([(f"t{i:02d}",)] * ((50 - i) * 10))
    return spark.createDataFrame(rows, "tok string")


def test_heavy_hitters_exact_with_forced_eviction(spark):
    """capacity=10 << 50 distinct forces constant eviction, yet the
    top-5 must come back EXACT: 5th frequency (460) is far above
    N/capacity (12750/10 = 1275)? No — 460 < 1275, so widen capacity
    to 40 where N/capacity = 318 < 460. The guarantee threshold is the
    test."""
    df = _zipf_df(spark)
    got = [
        (r["value"], r["cnt"])
        for r in heavy_hitters_topk(df, "tok", k=5, capacity=40).collect()
    ]
    want = [(f"t{i:02d}", (50 - i) * 10) for i in range(5)]
    assert got == want


def test_heavy_hitters_candidate_output_is_bounded(spark):
    """Phase 1 must emit <= capacity candidates per partition no matter
    the input size — the bounded-state claim itself."""
    df = _zipf_df(spark).repartition(4)
    cap = 8
    per_part = (
        _space_saving_candidates(df, "tok", cap)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert all(r["count"] <= cap for r in per_part)


def test_heavy_hitters_exact_when_capacity_covers_distinct(spark):
    """capacity >= distinct count -> no eviction ever -> exact top-k
    for ANY k."""
    df = _zipf_df(spark)
    got = [
        (r["value"], r["cnt"])
        for r in heavy_hitters_topk(df, "tok", k=50, capacity=64).collect()
    ]
    want = [(f"t{i:02d}", (50 - i) * 10) for i in range(50)]
    assert got == want


def test_bloom_merge_equals_bitmap_of_union(spark):
    """bit_or merge of two corpora's bitmaps == the bitmap built over
    their union, word for word — the incremental-screen invariant."""
    a = spark.range(0, 400).select(F.col("id").cast("string").alias("k"))
    b = spark.range(300, 700).select(F.col("id").cast("string").alias("k"))
    m = 4096
    merged = {
        r["word_idx"]: r["bits"]
        for r in bloom_merge(
            bloom_bitmap(a, "k", m_bits=m), bloom_bitmap(b, "k", m_bits=m)
        ).collect()
    }
    direct = {
        r["word_idx"]: r["bits"]
        for r in bloom_bitmap(a.unionByName(b), "k", m_bits=m).collect()
    }
    assert merged == direct


def test_bloom_merge_idempotent(spark):
    """Merging a bitmap with itself is a no-op (bit_or idempotence) —
    replaying a batch into the persisted screen state cannot corrupt
    it."""
    a = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    bm = bloom_bitmap(a, "k", m_bits=2048)
    twice = {
        r["word_idx"]: r["bits"] for r in bloom_merge(bm, bm).collect()
    }
    once = {r["word_idx"]: r["bits"] for r in bm.collect()}
    assert twice == once

"""Batch 44 registry entry (round 6, continued): sequence-gap
completeness audit —

- ``dq10_sequence_gap_audit``: missing-ID ranges of a derived table
  against its expected-contiguous key space — the completeness
  detector that answers "which records were dropped between ingest
  and this output?" as concrete ``[gap_start, gap_end]`` ranges
  instead of one count. The classic SQL form is a single
  ``lead() OVER (ORDER BY k)`` — a global window Spark funnels
  through one reducer — so the plan here is the hierarchical
  rewrite: within-bucket lead windows (partitioned), bucket-grain
  stitching within superbuckets (partitioned), and one triangular
  join at the tiny super-grain; every consecutive pair in the global
  order is produced by exactly one level.

Reference provenance: none direct — beyond-reference DQ family per
the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["dq10_sequence_gap_audit"]

_GAP_MIN_PRICE = 20000  # the derived table: bulk orders only
_GAP_BUCKET = 1024  # keys per bucket; each hierarchy level divides
#                     the stitched grain by this factor


@register(
    "dq10_sequence_gap_audit",
    f"""
    WITH f AS (
      SELECT o_orderkey AS k FROM orders
      WHERE o_totalprice >= {_GAP_MIN_PRICE}
    ), s AS (
      SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM f
    )
    SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
           nk - k - 1 AS n_missing
    FROM s WHERE nk > k + 1
    ORDER BY gap_start
    """,
    "Sequence-gap completeness audit: the missing o_orderkey ranges "
    "of the bulk-orders slice — every [gap_start, gap_end] hole in "
    "the surviving-ID sequence, the concrete answer to 'which "
    "records did the pipeline drop'. The oracle states the naive "
    "global-lead form; the Spark plan is the hierarchical rewrite "
    f"(bucket width {_GAP_BUCKET}): consecutive pairs inside a "
    "bucket come from a bucket-PARTITIONED lead, pairs across "
    "buckets from a superbucket-partitioned lead over the "
    "bucket-grain (min,max) relation, and pairs across superbuckets "
    "from a triangular join on the super-grain — each level divides "
    "the stitched grain by 1024, so two levels cover ~1M buckets "
    "and a third (same shape) covers any key space. No global "
    "window anywhere; every consecutive pair is produced by exactly "
    "one level.",
)
def dq10_sequence_gap_audit(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    f = orders.filter(
        F.col("o_totalprice") >= _GAP_MIN_PRICE
    ).select(F.col("o_orderkey").alias("k"))
    keyed = f.select(
        "k",
        F.expr(f"k div {_GAP_BUCKET}").alias("b"),
        F.expr(f"(k div {_GAP_BUCKET}) div {_GAP_BUCKET}").alias("sb"),
    )
    # level 0: consecutive pairs inside one bucket
    wb = Window.partitionBy("b").orderBy("k")
    lvl0 = keyed.select(
        "k", F.lead("k").over(wb).alias("nk")
    ).filter(F.col("nk").isNotNull())
    # bucket grain: (sb, b, mn, mx)
    bg = keyed.groupBy("sb", "b").agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    # level 1: last key of a bucket -> first key of the NEXT non-empty
    # bucket within the same superbucket
    wsb = Window.partitionBy("sb").orderBy("b")
    lvl1 = bg.select(
        F.col("mx").alias("k"), F.lead("mn").over(wsb).alias("nk")
    ).filter(F.col("nk").isNotNull())
    # super grain: (sb, smn, smx) — tiny; triangular join finds the
    # next non-empty superbucket's first key
    sg = bg.groupBy("sb").agg(
        F.min("mn").alias("smn"), F.max("mx").alias("smx")
    )
    nxt = sg.select(F.col("sb").alias("sb2"), F.col("smn").alias("smn2"))
    lvl2 = (
        sg.join(F.broadcast(nxt), F.col("sb2") > F.col("sb"))
        .groupBy("sb", "smx")
        .agg(F.min("smn2").alias("nk"))
        .select(F.col("smx").alias("k"), "nk")
    )
    pairs = lvl0.unionByName(lvl1).unionByName(lvl2)
    return (
        pairs.filter(F.col("nk") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
            (F.col("nk") - F.col("k") - 1).alias("n_missing"),
        )
        .orderBy("gap_start")
    )

"""Batch 41 registry entry (round 6, continued): sketch MERGEABILITY
as a first-class query —

- ``sk_hll_daily_merge``: per-day HLL sketches of the user set,
  merged into a cumulative daily distinct-user curve via
  ``hll_union_agg`` — the property that makes sketches the 100 TB
  answer: nightly shards aggregate once, and ANY rollup (cumulative,
  weekly, all-time) comes from unioning kilobyte sketch blobs, never
  re-scanning the corpus. Spark's Apache DataSketches functions
  (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``)
  carry the curve; correctness is an in-query epsilon contract
  against the EXACT cumulative curve (the w7 first-seen rewrite) —
  the a04/int8 pattern: the hash compare fails if the sketch ever
  degrades past its error budget.

Reference provenance: none direct — beyond-reference sketch family
per the SURVEY.md mandate (Flajolet 2007; Apache DataSketches HLL).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["sk_hll_daily_merge"]

_HLL_LGK = 12  # rse ~1.6% at lgK=12; the 5% contract has wide margin
_HLL_EPS = 0.05


@register(
    "sk_hll_daily_merge",
    """
    WITH fs AS (
      SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY user_id
    ), daily AS (
      SELECT day, count(*) AS n_new FROM fs GROUP BY day
    ), days AS (
      SELECT DISTINCT ts::DATE AS day FROM events
    )
    SELECT d.day,
           (sum(coalesce(dl.n_new, 0))
              OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING))::BIGINT
             AS cum_exact,
           true AS within_bound
    FROM days d LEFT JOIN daily dl ON dl.day = d.day
    ORDER BY d.day
    """,
    "Sketch mergeability, value-gated: one HLL sketch per day over "
    "that day's users (hll_sketch_agg, lgK=12), then the cumulative "
    "distinct-user curve from UNIONING the prefix's sketches "
    "(hll_union_agg over a triangular broadcast join on the "
    "day-grain sketch relation) — at 100 TB each nightly shard "
    "aggregates once and every rollup after that touches only "
    "KB-sized sketch blobs. The query asserts in-plan that each "
    "day's estimate sits within 5% of the EXACT cumulative curve "
    "(the w7 first-seen rewrite, also the oracle) — rse at lgK=12 "
    "is ~1.6%, so the contract fails only if the sketch machinery "
    "actually degrades.",
)
def sk_hll_daily_merge(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily_sk = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(_HLL_LGK)).alias("sk")
    )
    lo = daily_sk.select(
        F.col("day").alias("d2"), F.col("sk").alias("sk2")
    )
    est = (
        daily_sk.select("day")
        .join(F.broadcast(lo), F.col("d2") <= F.col("day"))
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk2")).alias("est")
        )
    )
    fs = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily_new = fs.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    lo2 = daily_new.select(
        F.col("day").alias("d3"), F.col("n_new").alias("n3")
    )
    exact = (
        daily_sk.select("day")
        .join(F.broadcast(lo2), F.col("d3") <= F.col("day"))
        .groupBy("day")
        .agg(F.sum("n3").alias("cum_exact"))
    )
    within = (
        F.abs(F.col("est") - F.col("cum_exact"))
        <= F.lit(_HLL_EPS) * F.col("cum_exact") + F.lit(2.0)
    )
    return (
        est.join(exact, "day")
        .select("day", "cum_exact", within.alias("within_bound"))
        .orderBy("day")
    )

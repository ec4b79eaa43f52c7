"""Batch 48 registry entries (round 7, continued):

- ``ev_funnel_reach``: ordered funnel signup -> view -> click ->
  purchase with GREEDY FIRST-CHAIN semantics — a user reaches step
  k+1 only with an event STRICTLY AFTER their realized step-k time.
  This is deliberately stronger than ``c2_event_funnel`` (batch 3),
  whose one-pass first-touch ordering (min_t(view) < min_t(click) <
  ...) rejects a user whose first click precedes their first view
  even when a later click completes the chain; the greedy chain is
  what product-analytics funnels actually report. Reported as
  per-step user counts and step-over-step conversion.

Conversions are int/int double divisions computed identically by both
engines. Last-touch attribution lives in batch 9
(``ev_attribution_last_touch``, as-of join + 7-day lookback).

Reference provenance: none direct — beyond-reference analytics per the
SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["ev_funnel_reach"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Ordered funnel reach
# ===========================================================================

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    ), counts AS (
      SELECT 1 AS step_no, 'signup' AS step, count(*) AS n_users FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'click', count(*) FROM s3
      UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    )
    SELECT step_no, step, n_users,
           round(n_users / NULLIF(lag(n_users, 1, n_users)
                 OVER (ORDER BY step_no), 0), 6) AS conv_from_prev
    FROM counts
    ORDER BY step_no
"""


@register(
    "ev_funnel_reach",
    _FUNNEL_ORACLE,
    "Ordered funnel signup->view->click->purchase: greedy first-chain "
    "semantics (step k+1 must be strictly after the user's step-k "
    "time), per-step user counts + step-over-step conversion. Scale: "
    "each step is one map-side-combined conditional min per user "
    "joined to the previous step's (user, t) frame — the step frames "
    "SHRINK monotonically, and every join is keyed on user_id (AQE "
    "broadcasts the later tiny steps). The final 4-row readout window "
    "is constant-size. No per-user sequence materialization.",
)
def ev_funnel_reach(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(step: str, prev):
        e = ev.filter(F.col("event_type") == step)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col("t")).drop(
                "t"
            )
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    frames = []
    prev = None
    for step in _FUNNEL_STEPS:
        prev = first_after(step, prev)
        frames.append(prev)

    counts = None
    for i, (step, fr) in enumerate(zip(_FUNNEL_STEPS, frames), start=1):
        row = fr.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_no"), F.lit(step).alias("step"), "n_users"
        )
        counts = row if counts is None else counts.unionByName(row)
    # step-over-step via a broadcast SELF-JOIN on step_no-1, not a
    # window: the registry-wide gate bans unpartitioned windows
    # outright, and even a 4-row readout should model the join form a
    # parameterized funnel (hundreds of steps x segments) would need.
    prev = counts.select(
        F.col("step_no").alias("_pno"), F.col("n_users").alias("_prev_n")
    )
    return (
        counts.join(
            F.broadcast(prev), F.col("step_no") - 1 == F.col("_pno"), "left"
        )
        .select(
            "step_no",
            "step",
            "n_users",
            # NULLIF-guarded denominator: sessions run ANSI-on, so a
            # funnel step that dries up mid-chain (prev_n = 0, or a
            # 0-row step 1 dividing by itself) would raise
            # DIVIDE_BY_ZERO as a bare division (ADVICE r7). Contract,
            # pinned identically in the oracle SQL via NULLIF(lag,0):
            # conversion out of an empty previous step is NULL.
            F.round(
                F.col("n_users")
                / F.nullif(
                    F.coalesce(F.col("_prev_n"), F.col("n_users")),
                    F.lit(0),
                ).cast("double"),
                6,
            ).alias("conv_from_prev"),
        )
        .orderBy("step_no")
    )

"""Batch 16 registry entries (round 6, continued): seasonal-baseline
anomaly detection over the event stream, embedding label-noise
screening, and the gaps-and-islands interval-coverage rollup.

Reference provenance: the reference's monitoring surface is status
counters and max-date scans (A8/A12); these add the detection layer an
operations/curation pipeline runs on the same data — "which days are
abnormal for their weekday", "which labels does the embedding space
disagree with", "how much wall-clock was actually covered" — each as a
declarative DataFrame plan with a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# EV: day-of-week seasonal baseline anomaly flags
# ===========================================================================

@register(
    "ev_dow_anomaly",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts)::DATE AS obs_day, count(*) AS n_events
      FROM events GROUP BY 1
    ), base AS (
      SELECT dayofweek(obs_day) AS dow, avg(n_events) AS mu,
             stddev_pop(n_events) AS sigma
      FROM daily GROUP BY 1
    )
    SELECT d.obs_day, d.n_events, b.dow,
           round(b.mu, 6) AS dow_mean,
           round(b.sigma, 6) AS dow_std,
           round(abs(d.n_events - b.mu) / nullif(b.sigma, 0), 6) AS abs_z,
           coalesce(abs(d.n_events - b.mu) / nullif(b.sigma, 0) > 2.0,
                    FALSE) AS is_anomaly
    FROM daily d JOIN base b ON b.dow = dayofweek(d.obs_day)
    ORDER BY d.obs_day
    """,
    "Seasonal-baseline anomaly detection: daily event counts compared "
    "against their own day-of-week mean/stddev (weekday seasonality is "
    "the first confounder of any volume alert), flagging days beyond "
    "2 sigma. Plan: one daily rollup (partial-aggregating), a 7-row "
    "baseline aggregate broadcast back onto it — no window, no "
    "self-join; at 100 TB the daily rollup is the only term that sees "
    "the data. Day-of-week normalized across engines (Spark "
    "dayofweek-1 == DuckDB dayofweek, Sunday=0); zero-variance "
    "weekdays yield NULL z and a definite FALSE flag.",
)
def ev_dow_anomaly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("obs_day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    dow = (F.dayofweek("obs_day") - 1).alias("dow")
    base = daily.groupBy(dow).agg(
        F.avg("n_events").alias("mu"),
        F.stddev_pop("n_events").alias("sigma"),
    )
    z = F.abs(F.col("n_events") - F.col("mu")) / F.nullif(
        F.col("sigma"), F.lit(0.0)
    )
    return (
        daily.withColumn("dow", F.dayofweek("obs_day") - 1)
        .join(F.broadcast(base), "dow")
        .select(
            "obs_day",
            "n_events",
            "dow",
            F.round("mu", 6).alias("dow_mean"),
            F.round("sigma", 6).alias("dow_std"),
            F.round(z, 6).alias("abs_z"),
            F.coalesce(z > 2.0, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("obs_day")
    )


# ===========================================================================
# SIM: label-noise screen via label-centroid assignment
# ===========================================================================

@register(
    "sim_label_outliers",
    """
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v,
             unnest(range(len(embedding))) AS pos
      FROM embeddings
    ), cent AS (
      SELECT label AS clabel, pos, avg(v) AS c FROM ex GROUP BY 1, 2
    ), cnorm AS (SELECT clabel, sqrt(sum(c*c)) AS cn FROM cent GROUP BY 1),
    vnorm AS (SELECT vec_id, sqrt(sum(v*v)) AS vn FROM ex GROUP BY 1),
    dots AS (
      SELECT e.vec_id, e.label, c.clabel, sum(e.v * c.c) AS dot
      FROM ex e JOIN cent c ON c.pos = e.pos
      GROUP BY 1, 2, 3
    ), cos AS (
      SELECT d.vec_id, d.label, d.clabel,
             round(d.dot / (vn.vn * cn.cn), 4) AS cos
      FROM dots d JOIN vnorm vn ON vn.vec_id = d.vec_id
                  JOIN cnorm cn ON cn.clabel = d.clabel
    ), best AS (
      SELECT vec_id, label, clabel AS best_label, cos AS best_cos
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, clabel ASC) AS rn FROM cos) WHERE rn = 1
    ), own AS (SELECT vec_id, cos AS own_cos FROM cos WHERE clabel = label)
    SELECT b.vec_id, b.label, b.best_label, o.own_cos, b.best_cos,
           round(b.best_cos - o.own_cos, 4) AS delta
    FROM best b JOIN own o ON o.vec_id = b.vec_id
    WHERE b.best_label <> b.label
    ORDER BY b.vec_id
    """,
    "Label-noise screen: vectors whose nearest label centroid is NOT "
    "their own label, with the disagreement margin — the mislabel "
    "candidates a curation loop reviews before supervised filtering. "
    "Spark plan is the IVF assignment shape: centroids partial-"
    "aggregate map-side to k x d and broadcast as k rows; scoring is "
    "one broadcast cross join + per-vector max(struct) argmax, with "
    "the own-label cosine riding the SAME groupBy as a conditional "
    "max — corpus scanned once, shuffle carries one row per vector. "
    "The oracle takes the independent pos-exploded relational route "
    "with a row_number argmax. Cosines round to 4dp before the argmax "
    "(ties to the smallest label in both engines).",
)
def sim_label_outliers(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import label_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return label_outliers(emb).orderBy("vec_id")


# ===========================================================================
# T9: gaps-and-islands interval coverage
# ===========================================================================

@register(
    "t9_interval_islands",
    """
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 1 HOUR AS e FROM events
    ), f AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), isl AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM f
    ), spans AS (
      SELECT user_id, island_id,
             epoch_ms(max(e)) - epoch_ms(min(s)) AS span_ms
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_islands,
           sum(span_ms)::BIGINT AS covered_ms,
           max(span_ms) AS max_island_ms
    FROM spans GROUP BY user_id ORDER BY user_id
    """,
    "Gaps-and-islands coverage rollup: each event projects a 1-hour "
    "activity interval; overlapping/touching intervals per user merge "
    "into maximal islands (running-max-of-prior-ends window, island id "
    "as the running sum of new-island flags), then per-user island "
    "count, total covered milliseconds, and longest island. One "
    "key-partitioned window + two key-local groupBys — no self-join, "
    "no explode; an island's union is contiguous by construction so "
    "covered time is exactly max_end - min_start. Equal-start ties "
    "cannot flip island boundaries (equal starts overlap), so the "
    "result is partition-layout invariant. Complements t5's interval "
    "OVERLAP join and t8's SCD2 interval BUILD.",
)
def t9_interval_islands(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.temporal import interval_islands

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    return interval_islands(iv, "user_id", "s", "e").orderBy("user_id")

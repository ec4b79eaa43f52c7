"""Batch 39 registry entries (round 6, continued): the recursive-SQL
surface (new in Spark 4) and two remaining engine behaviors —

- ``sql_recursive_date_spine``: calendar-spine generation + gap fill
  via ``WITH RECURSIVE`` in SPARK SQL itself — until Spark 4 the
  spine had to come from ``sequence()`` or a driver loop; now the
  declarative form runs in both engines nearly verbatim.
- ``sql_recursive_ewma``: a sequential recurrence (EWMA over daily
  counts) expressed ENTIRELY in Spark's recursive SQL — the exact
  shape this repo's DuckDB oracles have used all along, now runnable
  on the engine side too. The batch partition-map operator remains
  the scale path (recursion depth = series length); this pins the
  declarative twin at day grain where depth is bounded.
- ``w9_session_window_tvf``: batch ``session_window`` aggregation —
  the engine-native gap-sessionizer next to the lag/cumsum islands
  the ev_/st_ family builds by hand.
- ``s18_merge_schema_union``: schema-evolution reads — two parquet
  generations with different column sets union under ``mergeSchema``
  with missing columns null-filled, proven by aggregate parity
  against the base table.

Reference provenance: none direct — engine-surface completions per
the SURVEY.md mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "sql_recursive_date_spine",
    "sql_recursive_ewma",
    "w9_session_window_tvf",
    "s18_merge_schema_union",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


def _register_events_view(spark, sf_dir):
    _t(spark, sf_dir, "events").createOrReplaceTempView("_b39_events")
    # Spark caps recursive CTEs at 100 levels by default; the spine /
    # EWMA recursion is depth = days-in-range, so a >100-day table
    # would throw RECURSION_LEVEL_LIMIT_EXCEEDED. Idempotent raise.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")


# ===========================================================================
# Recursive SQL #1: calendar spine + gap fill
# ===========================================================================

_SPINE_SPARK_SQL = """
    WITH RECURSIVE spine(d) AS (
      SELECT min(to_date(ts)) FROM _b39_events
      UNION ALL
      SELECT date_add(d, 1) FROM spine
      WHERE d < (SELECT max(to_date(ts)) FROM _b39_events)
    ), daily AS (
      SELECT to_date(ts) AS d, count(*) AS n
      FROM _b39_events GROUP BY 1
    )
    SELECT s.d, coalesce(dl.n, 0) AS n_events
    FROM spine s LEFT JOIN daily dl ON dl.d = s.d
    ORDER BY s.d
"""


@register(
    "sql_recursive_date_spine",
    """
    WITH RECURSIVE spine(d) AS (
      SELECT min(ts::DATE) FROM events
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM spine
      WHERE d < (SELECT max(ts::DATE) FROM events)
    ), daily AS (
      SELECT ts::DATE AS d, count(*) AS n FROM events GROUP BY 1
    )
    SELECT s.d::DATE AS d, coalesce(dl.n, 0) AS n_events
    FROM spine s LEFT JOIN daily dl ON dl.d = s.d
    ORDER BY s.d
    """,
    "Calendar-spine gap fill via WITH RECURSIVE in SPARK SQL (new in "
    "Spark 4): the spine generates declaratively (linear recursion, "
    "depth = days in range) and left-joins the daily rollup with "
    "zero fill — the same recursive text, modulo date-arithmetic "
    "dialect, runs as the DuckDB oracle. Each recursion level is one "
    "row; the only corpus pass is the daily rollup. The data-derived "
    "broadcast spine (ts1/ts2) remains the alternative when the "
    "range is known; recursion removes the driver from spine "
    "construction entirely.",
)
def sql_recursive_date_spine(spark, sf_dir):
    _register_events_view(spark, sf_dir)
    return spark.sql(_SPINE_SPARK_SQL)


# ===========================================================================
# Recursive SQL #2: the EWMA recurrence, declaratively
# ===========================================================================

_EWMA_ALPHA = "0.25"  # exact binary fraction


def _ewma_recursive_sql(daily_src: str, date_expr: str) -> str:
    """The identical recursive walk for both engines — only the
    daily-rollup source expression differs by dialect."""
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, {date_expr} AS d, count(*) AS x
      FROM {daily_src} GROUP BY event_type, {date_expr}
    ), seq AS (
      SELECT event_type, d, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d)
               AS rn
      FROM daily
    ), walk AS (
      -- CAST to DOUBLE throughout: Spark otherwise types the decimal
      -- literals as DECIMAL and cannot merge the anchor's precision
      -- with the recursive term's
      SELECT event_type, d, x, rn, CAST(x AS DOUBLE) AS ewma
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.d, s.x, s.rn,
             CAST({_EWMA_ALPHA} AS DOUBLE) * s.x
               + (CAST(1.0 AS DOUBLE) - CAST({_EWMA_ALPHA} AS DOUBLE))
                 * w.ewma
      FROM walk w
      JOIN seq s ON s.event_type = w.event_type AND s.rn = w.rn + 1
    )
    SELECT event_type, d, x,
           CAST(floor(ewma * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)
             AS ewma
    FROM walk ORDER BY event_type, d
    """


@register(
    "sql_recursive_ewma",
    _ewma_recursive_sql("events", "ts::DATE"),
    "A sequential recurrence — EWMA (alpha=0.25) over per-type daily "
    "counts — expressed ENTIRELY in Spark's recursive SQL: the exact "
    "recursive-walk shape this repo's DuckDB oracles have pinned "
    "Python recurrences with since round 1 now runs on the engine "
    "side too, so Spark and DuckDB execute the SAME declarative text "
    "(modulo the date cast) and must agree bit-for-bit before the "
    "6dp floor. Day-grain input keeps recursion depth bounded "
    "(= series length) and each level is a tiny keyed join; the "
    "partition-map ewma_per_key remains the 100 TB path for "
    "row-grain series.",
)
def sql_recursive_ewma(spark, sf_dir):
    _register_events_view(spark, sf_dir)
    return spark.sql(
        _ewma_recursive_sql("_b39_events", "to_date(ts)")
    )


# ===========================================================================
# Batch session_window TVF
# ===========================================================================

_SW_GAP_MIN = 30


@register(
    "w9_session_window_tvf",
    f"""
    WITH ev AS (
      SELECT user_id, ts FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL {_SW_GAP_MIN} MINUTE
                  THEN 0 ELSE 1 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), islands AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM islands GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    f"Engine-native gap sessionization: batch session_window(ts, "
    f"'{_SW_GAP_MIN} minutes') groupBy — Spark merges overlapping "
    "per-event windows into variable-length sessions inside the "
    "aggregation operator itself, one user-key shuffle, no window "
    "functions. The oracle states the identical semantics as the "
    "classic lag/cumsum islands (the construction the ev_/st_ "
    "family uses), so the TVF and the hand-built sessionizer are "
    "proven interchangeable. At 100 TB both are one shuffle; the "
    "TVF also carries straight into Structured Streaming with "
    "watermarked state eviction.",
)
def w9_session_window_tvf(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{_SW_GAP_MIN} minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ===========================================================================
# Schema-evolution union via mergeSchema
# ===========================================================================


@register(
    "s18_merge_schema_union",
    """
    WITH gen1 AS (
      SELECT o_orderkey, o_orderstatus, NULL::VARCHAR AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ), gen2 AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
      SELECT * FROM gen1 UNION ALL SELECT * FROM gen2
    )
    SELECT o_orderstatus AS status,
           count(*) AS n,
           count(o_orderpriority) AS n_with_priority
    FROM unioned GROUP BY 1 ORDER BY 1
    """,
    "Schema-evolution read: generation 1 lands WITHOUT the priority "
    "column, generation 2 adds it; reading the directory pair with "
    "mergeSchema=true unions the footprints and null-fills the "
    "missing column for old files — the lakehouse behavior every "
    "long-lived dataset eventually leans on. The rollup counts rows "
    "and priority-bearing rows per status against a closed-form "
    "oracle from the base table, so both the union and the null fill "
    "are value-proven. Writes go to per-process scratch "
    "(overwrite mode — repeated gate runs reuse one copy).",
)
def s18_merge_schema_union(spark, sf_dir):
    import os

    from mcyj_datapipeline_spark.session import session_scratch

    orders = _t(spark, sf_dir, "orders")
    root = session_scratch("schema-evo")
    g1, g2 = os.path.join(root, "gen1"), os.path.join(root, "gen2")
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    ).write.mode("overwrite").parquet(g1)
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).write.mode("overwrite").parquet(g2)
    back = spark.read.option("mergeSchema", "true").parquet(g1, g2)
    return (
        back.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_orderpriority").alias("n_with_priority"),
        )
        .orderBy("status")
    )

"""Batch 23 registry entries (round 6, continued): personalized
PageRank (seed-anchored proximity), clickstream path mining over
sessions, and the first-seen rewrite of cumulative distinct users.

Reference provenance: none direct — the reference has no graph or
clickstream engine; these extend the event/graph families the same
data supports: "rank everything relative to THESE nodes" (the
recommendation/TrustRank formulation), "what 3-step journeys dominate
sessions", and "how many distinct users had we ever seen by day D"
(the growth curve every dashboard wants, which the naive
expanding-window COUNT DISTINCT makes quadratic).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.functions.dates import epoch_us
from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "g5_personalized_pagerank",
    "ev_session_paths",
    "w7_cumulative_distinct_users",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# G5: personalized PageRank from seed customers
# ===========================================================================

_G5_SEED_LIMIT = 10  # packed ids < 10 and even = customers 0..4

_G5_ROUND = """
    r{r} AS (
      SELECT nd.node,
             CASE WHEN s.node IS NOT NULL
                  THEN 0.15 / (SELECT n FROM ns) ELSE 0 END
             + 0.85 * coalesce(m.mass, 0) AS rank
      FROM nodes nd
      LEFT JOIN seeds s ON s.node = nd.node
      LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.d) AS mass
        FROM edges e JOIN r{p} r ON r.node = e.src
                     JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst
      ) m ON m.dst = nd.node
    )"""


@register(
    "g5_personalized_pagerank",
    f"""
    WITH base AS (
      SELECT DISTINCT o.o_custkey * 2 AS cn, l.l_suppkey * 2 + 1 AS sn
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT cn AS src, sn AS dst FROM base
      UNION ALL SELECT sn, cn FROM base
    ), nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (SELECT node FROM nodes
              WHERE node % 2 = 0 AND node < {_G5_SEED_LIMIT}),
    ns AS (SELECT count(*)::DOUBLE AS n FROM seeds),
    deg AS (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src),
    r0 AS (
      SELECT nd.node,
             CASE WHEN s.node IS NOT NULL
                  THEN 1.0 / (SELECT n FROM ns) ELSE 0 END AS rank
      FROM nodes nd LEFT JOIN seeds s ON s.node = nd.node
    ),
    {_G5_ROUND.format(r=1, p=0)},
    {_G5_ROUND.format(r=2, p=1)},
    {_G5_ROUND.format(r=3, p=2)}
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || (node >> 1)::VARCHAR
                ELSE 's' || (node >> 1)::VARCHAR END AS node,
           round(rank, 6) AS rank
    FROM r3 WHERE round(rank, 6) > 0 ORDER BY node
    """,
    "Personalized PageRank over the mirrored purchase graph: random "
    "walks teleport back to the SEED customers (custkey < 5), so rank "
    "measures proximity to those accounts — the recommendation / "
    "TrustRank formulation, next to g1's global centrality and g4's "
    "hop distance from the same seeds. Spark plan identical to g1's "
    "(weights pre-joined once, one hash join + one groupBy(dst) per "
    "round, constant plan via localCheckpoint); the seed flag rides "
    "the node relation from one setup-time broadcast semi-join, never "
    "re-derived per round. The oracle unrolls the same three seeded "
    "rounds as chained CTEs. Output keeps reached nodes only "
    "(round(rank,6) > 0 — identical cut both engines).",
)
def g5_personalized_pagerank(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import personalized_pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cn"),
            (F.col("l_suppkey") * 2 + 1).alias("sn"),
        )
        .distinct()
    )
    edges = base.select(
        F.col("cn").alias("src"), F.col("sn").alias("dst")
    ).union(base.select(F.col("sn"), F.col("cn")))
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter((F.col("node") % 2 == 0) & (F.col("node") < _G5_SEED_LIMIT))
    )
    ranks = personalized_pagerank(edges, seeds, iterations=3, damping=0.85)
    node_str = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("c"), F.shiftright("node", 1))
    ).otherwise(F.concat(F.lit("s"), F.shiftright("node", 1)))
    return (
        ranks.select(node_str.alias("node"), F.round("rank", 6).alias("rank"))
        .filter(F.col("rank") > 0)
        .orderBy("node")
    )


# ===========================================================================
# EV: session path mining (top 3-step journeys)
# ===========================================================================

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap
_TOP_PATHS = 20


@register(
    "ev_session_paths",
    f"""
    WITH breaks AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ids AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM breaks
    ), tri AS (
      SELECT event_type || '>' || lead(event_type, 1) OVER s
                        || '>' || lead(event_type, 2) OVER s AS path
      FROM ids
      WINDOW s AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
    )
    SELECT path, count(*) AS n FROM tri WHERE path IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT {_TOP_PATHS}
    """,
    "Clickstream path mining: the top-20 three-step journeys "
    "(event-type trigrams) within 30-minute sessions — the "
    "navigation-pattern query behind funnel design and anomaly "
    "triage, generalizing ev_markov's 1-step transitions to whole "
    "paths. Every window is partitioned by user (sessionization lag/"
    "cumsum) or by (user, session) (the two leads) — one shuffle on "
    "user_id total, since Catalyst reuses the partitioning across all "
    "three windows; trigram rows never materialize beyond the "
    "event count, and the final top-20 is a TakeOrdered over the "
    "path-grain counts. Ordering ties on ts break by event_id on "
    "both engines, so paths are layout-invariant.",
)
def ev_session_paths(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ids = (
        ev.withColumn("_prev", F.lag("ts").over(by_user))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (epoch_us("ts") - epoch_us("_prev") > _GAP_US)
            ).cast("int"),
        )
        .withColumn(
            "session_seq",
            F.sum("_new").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    by_session = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    paths = ids.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(by_session),
            F.lead("event_type", 2).over(by_session),
        ).alias("path"),
        F.lead("event_type", 2).over(by_session).alias("_third"),
    ).filter(F.col("_third").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(_TOP_PATHS)
    )


# ===========================================================================
# W7: cumulative distinct users via the first-seen rewrite
# ===========================================================================


@register(
    "w7_cumulative_distinct_users",
    """
    WITH fs AS (
      SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY user_id
    ), daily AS (
      SELECT day, count(*) AS new_users FROM fs GROUP BY day
    ), days AS (SELECT DISTINCT ts::DATE AS day FROM events)
    SELECT d.day,
           coalesce(dl.new_users, 0)::BIGINT AS new_users,
           (sum(coalesce(dl.new_users, 0))
              OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING))::BIGINT
             AS cum_users
    FROM days d LEFT JOIN daily dl ON dl.day = d.day
    ORDER BY d.day
    """,
    "Cumulative distinct users per day — the growth curve. The naive "
    "form (COUNT(DISTINCT user) OVER an expanding window) rescans "
    "every prefix and Spark refuses it anyway; the rewrite is the "
    "standard trick: distinct-by-day reduces to FIRST-SEEN day per "
    "user (one groupBy), daily new-user counts are day-grain, and the "
    "running total is a triangular join ON THE DAY-GRAIN relation "
    "(weeks/years of rows — KBs) computing both new_users and the "
    "cumulative in one conditional aggregate. The oracle states the "
    "same thing with the day-grain window DuckDB can run "
    "unpartitioned. At 100 TB: one user-key shuffle, one day rollup; "
    "nothing else touches the data.",
)
def w7_cumulative_distinct_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    fs = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily = fs.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    ).localCheckpoint(eager=False)
    days = ev.select("day").distinct()
    hi = daily.select(
        F.col("day").alias("d2"), F.col("new_users").alias("n2")
    )
    return (
        days.join(F.broadcast(hi), F.col("d2") <= F.col("day"), "left")
        .groupBy("day")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("d2") == F.col("day"), F.col("n2"))),
                F.lit(0),
            ).alias("new_users"),
            F.coalesce(F.sum("n2"), F.lit(0)).alias("cum_users"),
        )
        .orderBy("day")
    )

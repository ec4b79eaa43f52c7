"""Batch 9 registry entries (round 3): PCA embedding reduction (the
covariance pass as a map-side Gram matrix), Markov event-transition
analytics, throttle-dedup over event streams, and a
conditional-cumulative-sum (reset-on-refill) running balance.

Reference provenance: the event analytics generalize the dashboard's
per-agency activity rollups (website/generate_website_data.py); PCA
extends the embedding toolkit (quantization/ANN) with the standard
dim-reduction preprocessing step a training pipeline runs before
similarity search at scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Markov transitions over per-user event sequences
# ===========================================================================

@register(
    "ev_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type, next_type, count(*)::DOUBLE AS c
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, c::BIGINT AS n,
           round(c / sum(c) OVER (PARTITION BY event_type), 6) AS p
    FROM pairs ORDER BY event_type, next_type
    """,
    "First-order Markov transition matrix over per-user event "
    "sequences: P(next_type | type) with counts. One partitioned "
    "window (lead within user_id — single shuffle on user, no global "
    "sort), then a grouped count whose output is |event_types|^2 rows "
    "— the normalizing window runs over that tiny matrix, not the "
    "events. The standard session-behavior model input (next-action "
    "prediction, anomaly scoring of improbable transitions).",
)
def ev_markov_transitions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wnorm = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wnorm), 6
        ).alias("p"),
    ).orderBy("event_type", "next_type")


# ===========================================================================
# Throttle-dedup: drop repeats of (user, type) within a cool-down window
# ===========================================================================

@register(
    "ev_throttle_dedup",
    """
    WITH flagged AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM flagged
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
    ORDER BY event_id
    """,
    "Throttle-dedup: keep an event only if the SAME (user, type) last "
    "fired more than 30 minutes earlier — the alert/notification "
    "rate-limit semantics. NOTE the deliberate lag-vs-previous-KEPT "
    "distinction: this is lag-vs-previous-EVENT (each event compares "
    "to its immediate predecessor), the one-window form; "
    "previous-kept semantics needs the stateful streaming op "
    "(streaming/stateful.py) because keep decisions chain. One "
    "partitioned window on a compound key — no skew (user x type), "
    "single shuffle, and in streaming form this is exactly "
    "dropDuplicates within watermark.",
)
def ev_throttle_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("prev_ts", prev)
        .filter(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE"))
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )


# ===========================================================================
# Conditional cumulative sum with reset (running balance / refill)
# ===========================================================================

@register(
    "ev_running_value_resets",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS epoch
      FROM events
      WHERE event_type IN ('signup', 'purchase')
    )
    SELECT user_id, event_id, epoch::BIGINT AS epoch,
           round(sum(value) OVER (PARTITION BY user_id, epoch
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2)
             AS running_value
    FROM marked ORDER BY user_id, event_id
    """,
    "Cumulative sum with reset: purchase values accumulate per user "
    "and reset at every signup event — the classic "
    "balance-with-restock shape that naive SQL can't express without "
    "recursion. Two stacked partitioned windows, both on the user "
    "shuffle: window 1 numbers reset-epochs (running count of "
    "markers), window 2 accumulates within (user, epoch). Nothing "
    "global; epoch boundaries are data-driven.",
)
def ev_running_value_resets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "epoch",
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).over(w1),
    )
    w2 = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return marked.select(
        "user_id",
        "event_id",
        "epoch",
        F.round(F.sum("value").over(w2), 2).alias("running_value"),
    ).orderBy("user_id", "event_id")


# ===========================================================================
# PCA embedding reduction (rows-only: eigendecomposition is not
# SQL-expressible; orthonormality / reconstruction-error / variance-
# order properties are asserted in tests/test_pca.py)
# ===========================================================================

@register(
    "v3_pca_reduce",
    None,
    "PCA dim reduction for the embedding column (64 -> 8): one-pass "
    "map-side Gram accumulation (ONE ~33 KB partial row per partition "
    "reaches the driver, independent of corpus size), d x d eigensolve "
    "driver-side (d = embedding width, never data), Arrow-batched "
    "matmul projection. The preprocessing step before ANN at scale: "
    "8-dim reduced vectors make the IVF/LSH bucket assignment 8x "
    "cheaper while the full vectors stay for re-ranking. Deterministic "
    "basis (dominant-coordinate sign convention) so the output is "
    "stable across partitionings — property-tested.",
)
def v3_pca_reduce(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.pca import pca_fit, pca_project

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = pca_fit(emb, "embedding", k=8)
    out = pca_project(emb, model, "vec_id", "embedding", "reduced")
    return out.select(
        "vec_id",
        F.round(F.col("reduced")[0].cast("double"), 4).alias("pc1"),
        F.round(F.col("reduced")[1].cast("double"), 4).alias("pc2"),
        F.size("reduced").alias("k"),
    ).orderBy("vec_id")


# ===========================================================================
# Last-touch attribution (as-of join application)
# ===========================================================================

@register(
    "ev_attribution_last_touch",
    """
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts IS NOT NULL
                 AND c.ts >= p.ts - INTERVAL 7 DAY
                THEN c.event_id END AS attributed_click_id,
           (c.ts IS NOT NULL AND c.ts >= p.ts - INTERVAL 7 DAY)
             AS attributed
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    "Marketing-style last-touch attribution: each purchase credits the "
    "user's most recent click, but only within a 7-day lookback. "
    "Composed from the engine's as-of join operator (operators/"
    "temporal.py — union + one partitioned last-ignorenulls window, "
    "single shuffle on user_id, no inequality-join cross product) with "
    "the lookback as a post-join predicate. The oracle is DuckDB's "
    "native ASOF LEFT JOIN — the two independent implementations "
    "agreeing on ties (simultaneous click/purchase) is the point of "
    "the check.",
)
def ev_attribution_last_touch(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    att = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id", "ts"],
    )
    in_window = F.col("asof_ts").isNotNull() & (
        F.col("asof_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")
    )
    return att.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_window, F.col("asof_click_id")).alias(
            "attributed_click_id"
        ),
        in_window.alias("attributed"),
    ).orderBy("event_id")


# ===========================================================================
# TPC-H Q7 / Q8 analogs (multi-dimension join trees)
# ===========================================================================

@register(
    "sql20_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             extract(year FROM l.l_shipdate)::BIGINT AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 shape: bilateral trade volume by year between two "
    "nations. The join tree hangs every dimension off the fact with "
    "broadcasts (supplier, nation twice under different roles, "
    "customer); the nation-pair disjunction evaluates after both "
    "nation joins but the optimizer pushes each arm's IN-set "
    "(n_name IN (N1,N2)) into BOTH broadcast builds, so non-party "
    "nations never enter the hash tables. One real shuffle: "
    "lineitem-orders on the orderkey.",
)
def sql20_volume_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "volume"
        ),
    )
    party = ("NATION_1", "NATION_2")
    nations = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*party)
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nations.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            "s_nationkey",
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nations.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            "c_nationkey",
        )
        .select(F.col("c_custkey").alias("o_custkey"), "cust_nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), "l_suppkey")
        .join(
            orders.join(F.broadcast(cust), "o_custkey").select(
                F.col("o_orderkey").alias("l_orderkey"), "cust_nation"
            ),
            "l_orderkey",
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "sql21_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM (
      SELECT extract(year FROM o.o_orderdate)::BIGINT AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
    ) all_sales
    GROUP BY o_year ORDER BY o_year
    """,
    "TPC-H Q8 shape: one nation's market share inside a region, by "
    "year — the conditional-share aggregate over a 6-dimension join "
    "tree. Region restriction prunes through nation into the customer "
    "broadcast build (region -> nation -> customer chain of broadcast "
    "semi-filters); the supplier-nation dimension rides a separate "
    "broadcast; numerator and denominator fold into ONE aggregate "
    "pass via the conditional sum.",
)
def sql21_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "volume"
        ),
    )
    nation = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "s_nationkey",
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "nation")
    )
    asia_nations = nation.join(
        F.broadcast(
            _t(spark, sf_dir, "region")
            .filter(F.col("r_name") == "ASIA")
            .select(F.col("r_regionkey").alias("n_regionkey"))
        ),
        "n_regionkey",
    ).select(F.col("n_nationkey").alias("c_nationkey"))
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), "c_nationkey", "left_semi")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cust), "o_custkey", "left_semi")
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
    )
    return (
        li.join(F.broadcast(supp), "l_suppkey")
        .join(orders, "l_orderkey")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("nation") == "NATION_3", F.col("volume")
                    ).otherwise(0.0)
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ===========================================================================
# Semi-structured props via Spark 4 VARIANT
# ===========================================================================

@register(
    "ev_props_variant_rollup",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
           max(json_extract(props, '$.k')::BIGINT) AS max_k,
           sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_missing_field
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Semi-structured rollup through Spark 4's VARIANT type: "
    "parse_json(props) ONCE into the binary variant encoding, then "
    "typed path extraction (v:k::bigint) feeds a plain grouped "
    "aggregate. Versus per-field get_json_object calls, the parse "
    "happens once per row regardless of how many fields are read, and "
    "absent paths yield NULL (counted here) instead of errors — the "
    "open-schema event-props pattern without a pre-declared struct. "
    "At 100 TB the variant parse is the scan-side cost; storing the "
    "column AS variant (shredded parquet) moves even that to ingest.",
)
def ev_props_variant_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.expr("v:k::bigint")
    missing = F.expr("v:missing")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias(
                "n_missing_field"
            ),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# Null-safe join semantics
# ===========================================================================

@register(
    "j18_null_safe_join",
    """
    WITH a AS (
      SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS grp
      FROM documents WHERE doc_id % 2 = 0
    ), b AS (
      SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS grp,
             count(*) AS n_b
      FROM documents WHERE doc_id % 2 = 1
      GROUP BY 1
    )
    SELECT a.doc_id, a.grp, b.n_b
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    ORDER BY a.doc_id
    """,
    "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL group keys "
    "MATCH each other instead of silently dropping — the semantics "
    "users actually want when a nullable enrichment key means "
    "'unknown' bucket, and a classic silent-data-loss bug with plain "
    "equality. Spark plans <=> as a HASHED join key exactly like =, so "
    "the null bucket shuffles to one partition — noted skew hazard: a "
    "mostly-null key wants the null rows split out and handled as a "
    "broadcast union instead (same decomposition as the salted join).",
)
def j18_null_safe_join(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    grp = F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("source")
    )
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", grp.alias("grp")
    )
    b = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select(grp.alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, a["grp"].eqNullSafe(b["grp"]))
        .select("doc_id", a["grp"].alias("grp"), "n_b")
        .orderBy("doc_id")
    )


# ===========================================================================
# Chained sequential ops: keep/drop chains and recursive smoothers
# depend on previous OUTPUTS — not WINDOW-expressible. Verified against
# plain-Python references in tests/test_sequential.py (incl. the
# chain-vs-lag semantic case); registered rows-only HERE, then batch 11
# attaches recursive-CTE DuckDB oracles to both (a per-key ordered walk
# carrying the previous output IS expressible as a recursive CTE, and
# group sizes keep the recursion depth trivial at oracle scale).
# ===========================================================================

@register(
    "ev_throttle_chained",
    None,
    "Throttle with previous-KEPT semantics (the alerting rate-limit "
    "that actually chains): within (user, type), keep an event iff "
    ">30min after the last KEPT one. Ordered partition-map recurrence "
    "— one shuffle on the compound key, O(group) sequential pass, "
    "state never crosses keys. The batch/backfill twin of the "
    "stateful-streaming updater; the window-lag form "
    "(ev_throttle_dedup) is its one-pass approximation.",
)
def ev_throttle_chained(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sequential import (
        throttle_keep_chain,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return throttle_keep_chain(
        ev, ["user_id", "event_type"], "ts", 1800, "event_id"
    ).orderBy("event_id")


@register(
    "ev_ewma_value",
    None,
    "Per-user EWMA of purchase values (alpha=0.3, adjust=False "
    "recurrence): the recursive smoother that window functions cannot "
    "express without numerically-explosive a^(-j) prefix tricks. "
    "Ordered partition-map; NULL values carry the smoother forward. "
    "Verified against the closed-form Python recurrence in tests.",
)
def ev_ewma_value(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sequential import ewma_per_key

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts", "value")
    out = ewma_per_key(ev, ["user_id"], "ts", "value", 0.3, "event_id")
    # cross-engine-stable 6dp: floor(x*1e6+0.5)/1e6, the ts3 formula.
    # F.round uses BigDecimal HALF_UP on the double's SHORTEST decimal
    # repr while DuckDB rounds the exact binary value, so a true 6dp
    # tie (e.g. 65.8639815, which this recurrence of 2dp cents with
    # decimal-friendly 0.3/0.7 weights manufactures regularly) rounds
    # differently per engine — caught by the first FULL-registry sf0.1
    # gate (round 7): 6/10k rows. Identical float ops on identical
    # doubles, by contrast, agree everywhere.
    stable6 = F.floor(F.col("ewma") * 1000000.0 + F.lit(0.5)) / 1000000.0
    return out.select(
        "event_id", "user_id", stable6.alias("ewma")
    ).orderBy("event_id")


@register(
    "text_compression_ratio",
    None,
    "Compressibility quality signal (Gopher-style): zlib-deflate bytes "
    "/ raw UTF-8 bytes per document — repetitive spam compresses far "
    "below fluent text, random bytes sit near 1.0. Arrow-batched "
    "mapInPandas kernel (zlib is not SQL-expressible): per row one "
    "C-speed deflate, output is (id, 2 numbers), text never leaves "
    "the stage. Deterministic at fixed level; partitioning-invariance "
    "and junk-vs-fluent ordering tested.",
)
def text_compression_ratio(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.text_analysis import (
        compression_ratio,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = compression_ratio(docs)
    return out.select(
        "doc_id", "n_bytes", F.round("ratio", 6).alias("ratio")
    ).orderBy("doc_id")


# ===========================================================================
# E10 flagship: event-analytics pipeline (sessionize -> session stats
# -> per-user conversion rollup) as ONE declarative plan
# ===========================================================================

@register(
    "e10_event_analytics_pipeline",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type, value,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
      FROM seq
    ), sessions AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    ), per_session AS (
      SELECT user_id, session_seq,
             count(*) AS n_events,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                               THEN value END), 0) AS revenue,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT user_id,
           count(*) AS n_sessions,
           sum(n_events)::BIGINT AS n_events,
           round(sum(revenue), 2) AS total_revenue,
           sum(converted)::BIGINT AS converting_sessions,
           round(sum(converted)::DOUBLE / count(*), 4) AS conversion_rate
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
    "E10 flagship: the full event-analytics funnel as one declarative "
    "plan — gap-sessionization (lag + cumulative break-sum, the "
    "oracle-checkable batch twin of session_window), per-session "
    "revenue/conversion aggregates, per-user conversion rollup. "
    "Everything rides ONE shuffle on user_id: both windows and both "
    "aggregations are user-partitioned, so Catalyst plans a single "
    "Exchange and the final rollup is map-side-combinable. At 100 TB "
    "this is the shape that replaces a DAG of five ETL jobs with one "
    "scan.",
)
def e10_event_analytics_pipeline(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE"))
    ).cast("int")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(by_user))
        .withColumn("brk", brk)
        .withColumn(
            "session_seq",
            F.sum("brk").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    is_purchase = F.col("event_type") == "purchase"
    per_session = sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.coalesce(
            F.sum(F.when(is_purchase, F.col("value"))), F.lit(0.0)
        ).alias("revenue"),
        F.max(F.when(is_purchase, 1).otherwise(0)).alias("converted"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("revenue"), 2).alias("total_revenue"),
            F.sum("converted").alias("converting_sessions"),
            F.round(
                F.sum("converted") / F.count(F.lit(1)), 4
            ).alias("conversion_rate"),
        )
        .orderBy("user_id")
    )

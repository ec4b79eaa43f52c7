"""Batch 12 registry entries (round 3, continued): three remaining
decision-support shapes not yet in the sql1..sql26 family — year-over-
year growth via aggregate self-join, share-of-total via a window over
an aggregated relation, and a conformed-dimension channel union.

Reference provenance: like the earlier SQL batches these extend the
engine-completeness surface (the reference has no SQL engine); each
pattern is a staple of warehouse workloads a migrating user brings
along, registered with a DuckDB value oracle and a plan-shape note.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


@register(
    "sql27_yoy_revenue_growth",
    """
    WITH yearly AS (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
             sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, year(o.o_orderdate)
    )
    SELECT cur.nation, cur.yr,
           round(cur.revenue, 2) AS revenue,
           round(cur.revenue / prev.revenue, 6) AS yoy_ratio
    FROM yearly cur JOIN yearly prev
      ON prev.nation = cur.nation AND prev.yr = cur.yr - 1
    ORDER BY cur.nation, cur.yr
    """,
    "Year-over-year growth: ONE aggregation pass builds the (nation, "
    "year) revenue relation, then the YoY join is a self-join of that "
    "TINY aggregate (|nations| x |years| rows — broadcast, never a "
    "second pass over facts). Customer and nation decorations "
    "broadcast into the fact scan, so the plan is scan -> one shuffle "
    "on (nation, year) -> broadcast self-join. The lag-window form is "
    "equivalent; the join form is shown because it also handles "
    "non-contiguous periods.",
)
def sql27_yoy_revenue_growth(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    cur = yearly.alias("cur")
    prev = yearly.select(
        F.col("nation").alias("p_nation"),
        (F.col("yr") + 1).alias("p_yr"),
        F.col("revenue").alias("p_revenue"),
    )
    return (
        cur.join(
            F.broadcast(prev),
            (F.col("nation") == F.col("p_nation"))
            & (F.col("yr") == F.col("p_yr")),
        )
        .select(
            "nation",
            "yr",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.col("revenue") / F.col("p_revenue"), 6).alias(
                "yoy_ratio"
            ),
        )
        .orderBy("nation", "yr")
    )


@register(
    "sql28_revenue_share_of_region",
    """
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS region_share
    FROM nat ORDER BY region, nation
    """,
    "Share-of-total: the window runs over the AGGREGATED (region, "
    "nation) relation — 25 rows — partitioned by region, never over "
    "raw facts. The only fact-table work is the single groupBy; "
    "decorations broadcast. This is the scale-safe shape for every "
    "percent-of-parent report: aggregate first, window the rollup.",
)
def sql28_revenue_share_of_region(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("region")
    return nat.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "region_share"
        ),
    ).orderBy("region", "nation")


@register(
    "sql29_channel_union_rollup",
    """
    WITH interactions AS (
      SELECT 'orders' AS channel,
             date_trunc('month', o_orderdate)::DATE AS period,
             o_totalprice AS amount
      FROM orders
      UNION ALL
      SELECT 'events', date_trunc('month', ts)::DATE, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    )
    SELECT channel, period,
           count(*) AS n,
           round(sum(amount), 2) AS total_amount
    FROM interactions
    GROUP BY channel, period
    ORDER BY channel, period
    """,
    "Conformed-dimension channel union (the TPC-DS across-channel "
    "staple): heterogeneous sources project onto one (channel, period, "
    "amount) shape BEFORE the union, so the rollup is a single "
    "groupBy over the concatenated scans — Spark unions are metadata "
    "(no shuffle, no materialization); partial aggregation happens "
    "per-source-partition and only (channel, month) cells shuffle. "
    "Adding a third channel is one more SELECT, not a new plan.",
)
def sql29_channel_union_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        F.lit("orders").alias("channel"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "period"
        ),
        F.col("o_totalprice").alias("amount"),
    )
    events = (
        _t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select(
            F.lit("events").alias("channel"),
            F.date_trunc("month", F.col("ts")).cast("date").alias("period"),
            F.col("value").alias("amount"),
        )
    )
    return (
        orders.unionByName(events)
        .groupBy("channel", "period")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("amount"), 2).alias("total_amount"),
        )
        .orderBy("channel", "period")
    )


# ===========================================================================
# O12: two-dimensional data-skipping layout (Z-order write + read-back)
# ===========================================================================

@register(
    "o12_zorder_write_roundtrip",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 400
      AND o_totalprice BETWEEN 50000 AND 150000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "K3 scale layout, 2-D: write orders range-clustered along the "
    "Z-order (Morton) curve of (o_custkey, o_totalprice), read back "
    "with predicates on BOTH dimensions. Every file then carries a "
    "tight min/max bounding box on both columns, so footer stats "
    "prune files for predicates on either — the contract of Delta's "
    "OPTIMIZE ZORDER BY, built from repartitionByRange + "
    "sortWithinPartitions on the interleaved-bit key (flat codegen, "
    "one stats scan + one range exchange). Box tightness vs an "
    "unclustered write is asserted in test_zorder_files_have_tight_boxes.",
)
def o12_zorder_write_roundtrip(spark, sf_dir):
    import os

    from mcyj_datapipeline_spark.io import write_zordered

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    from mcyj_datapipeline_spark.session import session_scratch

    out = os.path.join(session_scratch("zorder"), "data")
    write_zordered(orders, out, "o_custkey", "o_totalprice", n_files=8)
    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("o_custkey").between(100, 400)
            & F.col("o_totalprice").between(50000.0, 150000.0)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ===========================================================================
# F28: sentence expansion as a Python UDTF consumed via LATERAL
# ===========================================================================

@register(
    "f28_sentence_split_udtf",
    r"""
    WITH prep AS (
      SELECT doc_id, replace(text, ' spark ', '. ') AS t FROM documents
    ), parts AS (
      SELECT doc_id,
             list_filter(string_split_regex(t, '[.!?]+\s+'), x -> x <> '')
               AS ps
      FROM prep
    )
    SELECT doc_id, generate_subscripts(ps, 1) - 1 AS idx,
           unnest(ps) AS sentence
    FROM parts ORDER BY doc_id, idx
    """,
    "One-row-in/N-rows-out expansion as a Spark 4 Python UDTF joined "
    "with correlated LATERAL syntax — the relation-shaped seam for "
    "expansions that need real Python (model tokenizers, NLP "
    "sentencizers) while the query stays SQL. Arrow-optimized batches "
    "cross the boundary columnar; the sentence rule here is "
    "regex-simple so DuckDB reproduces it exactly (punctuation is "
    "synthesized deterministically — the corpus is punctuation-free). "
    "For split rules expressible in Spark SQL, explode(split()) stays "
    "fully JVM-side and is the preferred form (a05, f22).",
)
def f28_sentence_split_udtf(spark, sf_dir):
    import re as _re

    from mcyj_datapipeline_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" spark "), F.lit(". ")).alias("t"),
    )
    view = "docs_udtf_" + _re.sub(r"[^A-Za-z0-9]", "_", sf_dir)
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, s.idx, s.sentence
        FROM {view} d, LATERAL split_sentences(d.t) s
        ORDER BY d.doc_id, s.idx
        """
    )


# ===========================================================================
# K7: two-phase-commit JSONL sink (Data Source API writer) round trip
# ===========================================================================

@register(
    "k7_jsonl_atomic_roundtrip",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderkey % 10 = 3
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "K7 sink: the jsonl_atomic Python Data Source writer — tasks stage "
    "uuid-named part files and return them as commit messages; the "
    "driver publishes them in ONE manifest swap (commit) or deletes "
    "them (abort), so readers resolving the manifest can never observe "
    "a half-written job — the Hadoop-committer/Delta-log contract. "
    "Round trip: write a filtered slice, read back manifest-resolved, "
    "aggregate; the oracle aggregates the source directly. Failure "
    "atomicity is separately proven by "
    "test_jsonl_atomic_failed_job_publishes_nothing.",
)
def k7_jsonl_atomic_roundtrip(spark, sf_dir):
    import os

    from mcyj_datapipeline_spark.session import session_scratch
    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    out = os.path.join(session_scratch("jsonl_atomic"), "data")
    slice_df = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    slice_df.write.format("jsonl_atomic").mode("overwrite").save(out)
    back = read_jsonl_atomic(spark, out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )

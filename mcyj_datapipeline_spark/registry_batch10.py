"""Batch 10 registry entries (round 3, continued): the five remaining
TPC-H optimizer shapes — Q2 (correlated min-cost supplier), Q9 (profit
rollup over a five-way join tree), Q11 (HAVING against a global scalar
subquery), Q20 (nested semi-join through an aggregated subquery), and
Q21 (double correlated EXISTS / NOT EXISTS, re-expressed as one
per-order aggregate).

The synthetic testdata has no ``partsupp`` table and ``lineitem``
carries no commit/receipt dates, so each query is the *shape* analog on
the available tables: ``lineitem`` acts as the part<->supplier bridge
(unit cost = l_extendedprice / l_quantity) and "late" is shipdate more
than 60 days past the order date. What the optimizer must do — the
correlated-scalar broadcast, the semi-join pushdown, the
single-aggregate-pass EXISTS elimination — is identical.

Reference provenance: the reference repo has no SQL engine; these
extend the engine-completeness surface the way sql1..sql21 (batches
2-9) did, so a user bringing arbitrary relational workloads to this
repo finds every classic decision-support plan shape exercised against
a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# TPC-H Q2 analog: minimum-cost supplier per part (correlated min)
# ===========================================================================

@register(
    "sql22_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND l.l_quantity > 0
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           round(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN part p     ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'LARGE'
      AND c.unit_cost = (
        SELECT min(c2.unit_cost) FROM cost c2
        WHERE c2.l_partkey = c.l_partkey
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 shape: cheapest in-region supplier per part, where the "
    "correlated scalar subquery (min cost for THIS part) becomes a "
    "grouped re-aggregation joined back on the part key. Spark plan: "
    "the region restriction reaches lineitem as a broadcast semi-chain "
    "(region -> nation -> supplier, all broadcast), unit costs "
    "aggregate once on (partkey, suppkey), the per-part min is a "
    "second tiny aggregate of THAT result (not a window over raw "
    "rows), and the equality join back is partkey-aligned so AQE can "
    "keep it local. Part / supplier / nation decorations are all "
    "broadcast; the single real shuffle is the cost groupBy. Top-100 "
    "is TakeOrderedAndProject — no global sort materializes.",
)
def sql22_min_cost_supplier(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = nation.join(
        F.broadcast(
            region.select(F.col("r_regionkey").alias("n_regionkey"))
        ),
        "n_regionkey",
    )
    supp = _t(spark, sf_dir, "supplier")
    eu_supp = supp.join(
        F.broadcast(
            eu_nations.select(F.col("n_nationkey").alias("s_nationkey"))
        ),
        "s_nationkey",
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    cost = (
        li.join(
            F.broadcast(eu_supp.select(F.col("s_suppkey").alias("l_suppkey"))),
            "l_suppkey",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    # Correlated scalar min -> grouped min of the (already tiny) cost
    # relation, joined back on the same key the cost agg shuffled on.
    min_cost = cost.groupBy("l_partkey").agg(
        F.min("unit_cost").alias("min_unit_cost")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    return (
        cost.join(min_cost, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_unit_cost"))
        .join(
            F.broadcast(part.select(
                F.col("p_partkey").alias("l_partkey"), "p_type"
            )),
            "l_partkey",
        )
        .join(
            F.broadcast(
                supp.select(
                    F.col("s_suppkey").alias("l_suppkey"),
                    "s_acctbal", "s_name", "s_nationkey",
                )
            ),
            "l_suppkey",
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"), "n_name"
                )
            ),
            "s_nationkey",
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "p_type",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ===========================================================================
# TPC-H Q9 analog: profit by nation and order-year
# ===========================================================================

@register(
    "sql23_profit_by_nation_year",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             extract(year FROM o.o_orderdate)::BIGINT AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    "TPC-H Q9 shape: profit (revenue minus modeled supply cost) by "
    "supplier nation and order year over a five-way join tree. The "
    "p_name LIKE filter prunes part FIRST and rides a broadcast into "
    "lineitem (a semi-filter that typically drops ~90% of the fact "
    "before anything shuffles); supplier+nation fold into one "
    "broadcast decoration; the only real shuffle is lineitem-orders "
    "on the orderkey, followed by a two-column groupBy whose "
    "cardinality is |nations| x |years|. At 100 TB the same plan "
    "holds: every dimension is broadcast-size, and AQE coalesces the "
    "post-filter fact partitions.",
)
def sql23_profit_by_nation_year(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "s_nationkey",
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "nation")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    return (
        li.join(
            F.broadcast(part.select(
                F.col("p_partkey").alias("l_partkey"), "p_retailprice"
            )),
            "l_partkey",
        )
        .join(F.broadcast(supp_nat), "l_suppkey")
        .join(orders, "l_orderkey")
        .groupBy(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


# ===========================================================================
# TPC-H Q11 analog: important parts vs a global-scalar threshold
# ===========================================================================

@register(
    "sql24_important_value_parts",
    """
    WITH nat_value AS (
      SELECT l.l_partkey, sum(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM nat_value
    WHERE value > (SELECT sum(value) * 0.001 FROM nat_value)
    ORDER BY value DESC, l_partkey
    """,
    "TPC-H Q11 shape: parts whose in-nation shipped value exceeds a "
    "fraction of the nation's TOTAL value — the HAVING-against-a-"
    "global-scalar-subquery pattern. Spark plan: the nation filter "
    "broadcasts into lineitem, ONE shuffle builds the per-part values, "
    "the global threshold is a second aggregate OF THAT RESULT (tiny) "
    "cross-joined back as a broadcast scalar — the fact table is "
    "scanned exactly once, with the grouped relation persisted across "
    "its two consumers so the shared scan isn't recomputed.",
)
def sql24_important_value_parts(spark, sf_dir):
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("s_nationkey"))),
        "s_nationkey",
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    per_part = (
        li.join(
            F.broadcast(supp.select(F.col("s_suppkey").alias("l_suppkey"))),
            "l_suppkey",
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    # Pin the grouped relation: both the threshold aggregate and the
    # final filter consume it; without this the fact scan+shuffle runs
    # twice. At scale per_part is |parts| rows — safely cacheable.
    # (pin, not bare persist: a caller composing in released_after()
    # gets the lifecycle bounded; bench/driver clearCache otherwise.)
    from mcyj_datapipeline_spark.operators.caching import pin

    per_part = pin(per_part)
    threshold = per_part.agg(
        (F.sum("value") * F.lit(0.001)).alias("thr")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ===========================================================================
# TPC-H Q20 analog: suppliers with excess shipped volume of target parts
# ===========================================================================

@register(
    "sql25_excess_shipped_parts",
    """
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_2'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(l.l_quantity) > 50
      )
    ORDER BY s.s_name
    """,
    "TPC-H Q20 shape: suppliers in one nation who shipped more than a "
    "threshold quantity of any target-brand part — a semi-join whose "
    "right side is itself an aggregated subquery behind a broadcast "
    "part filter. Spark plan: part's brand filter broadcasts into "
    "lineitem (fact pruned before the shuffle), one groupBy on "
    "(suppkey, partkey) applies the HAVING, the surviving supplier "
    "keys collapse to a distinct set that LEFT SEMI joins supplier "
    "— and because |suppliers| is tiny relative to the fact, the "
    "semi-join itself broadcasts the aggregated side.",
)
def sql25_excess_shipped_parts(spark, sf_dir):
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    heavy = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("s_nationkey"))),
            "s_nationkey",
        )
        .join(F.broadcast(heavy), "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


# ===========================================================================
# TPC-H Q21 analog: the sole-late-supplier count (EXISTS / NOT EXISTS
# collapsed into one per-order aggregate)
# ===========================================================================

@register(
    "sql26_waiting_suppliers",
    """
    WITH base AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    late AS (
      SELECT * FROM base
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM base l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 50
    """,
    "TPC-H Q21 shape: suppliers who were the SOLE late supplier on a "
    "multi-supplier finished order. The oracle keeps the textbook "
    "double correlated EXISTS / NOT EXISTS; the Spark plan eliminates "
    "both subqueries with ONE per-order aggregate — n_supp = distinct "
    "suppliers on the order, n_late_supp = distinct LATE suppliers — "
    "then a late row qualifies iff n_supp >= 2 AND n_late_supp = 1 "
    "(its own supplier is necessarily the late one). That turns two "
    "correlated shuffled semi/anti joins over the fact into one "
    "orderkey groupBy plus an orderkey-aligned join back: strictly "
    "fewer shuffles, no correlated re-scan, and the same answer — "
    "which the oracle's EXISTS form independently proves. Top-50 via "
    "TakeOrderedAndProject.",
)
def sql26_waiting_suppliers(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    base = li.join(orders, "l_orderkey").withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
    )
    per_order = base.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    late = base.filter(F.col("is_late"))
    qualifying = (
        late.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        qualifying.join(F.broadcast(supp), "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )

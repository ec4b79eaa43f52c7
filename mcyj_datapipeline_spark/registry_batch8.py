"""Batch 8 registry entries (round 3): C4-style corpus-wide segment
dedup with document reassembly, and the remaining classic TPC-H
optimizer shapes the testdata columns can express (Q3/Q4/Q6/Q10/Q19
analogs).

Reference provenance: segment-level dedup generalizes the reference's
document-level sha256 dedup (run_full_pipeline.py:44-61) down to
sub-document granularity — the C4/CCNet "remove duplicated lines
across the corpus" step every large-scale text pipeline runs; the SQL
shapes widen the decorrelation/pushdown surface started in batches 6-7.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# C4-style segment-level dedup + document rewrite
# ===========================================================================

@register(
    "dedup_segment_rewrite",
    """
    WITH segs AS (
      SELECT doc_id, seg_idx,
             array_to_string(words[(seg_idx * 10 + 1):(seg_idx * 10 + 10)], ' ') AS seg
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
           LATERAL (SELECT unnest(generate_series(
               0, (len(words) - 1) // 10)) AS seg_idx)
    ),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT doc_id,
           string_agg(seg, ' ' ORDER BY seg_idx) AS text,
           count(*) AS n_segs_kept
    FROM ranked WHERE rn = 1
    GROUP BY doc_id ORDER BY doc_id
    """,
    "C4/CCNet-style corpus-wide segment dedup: split every document "
    "into fixed 10-word segments, keep only the FIRST occurrence of "
    "each distinct segment corpus-wide (first = lowest (doc_id, "
    "seg_idx)), and reassemble the surviving segments into rewritten "
    "documents. Docs whose every segment was seen earlier disappear "
    "entirely — subsuming exact-duplicate removal. Two shuffles at any "
    "scale: one content-addressed (hash-partition by segment for the "
    "first-wins window — each segment group is tiny, so no skew), one "
    "back on doc_id for reassembly. The segment window never sorts "
    "globally; at 100 TB swap the segment string for its xxhash64 in "
    "the shuffle key so the wide text column stays map-side.",
)
def dedup_segment_rewrite(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    segs = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.size("words") - F.lit(1)) / F.lit(10)).cast(
                        "long"
                    ),
                ),
                lambda i: F.struct(
                    i.cast("long").alias("seg_idx"),
                    F.array_join(
                        F.slice(F.col("words"), i * 10 + 1, 10), " "
                    ).alias("seg"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.seg_idx", "s.seg")
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    kept = segs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_segs_kept"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# TPC-H shapes: Q3 / Q4 / Q6 / Q10 / Q19 analogs
# ===========================================================================

@register(
    "sql15_unshipped_topk",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: top-10 highest-revenue orders taken before a date "
    "but shipped after it, for one market segment. Both date filters "
    "and the segment filter push to their scans BEFORE any join; the "
    "filtered customer keys broadcast; the final top-10 is "
    "TakeOrderedAndProject over the grouped revenue — the global sort "
    "never materializes.",
)
def sql15_unshipped_topk(spark, sf_dir):
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    ).select(
        F.col("l_orderkey"), "l_extendedprice", "l_discount"
    )
    return (
        orders.join(F.broadcast(cust), "o_custkey")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "sql16_priority_waiting",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "TPC-H Q4 shape: orders (by priority) having at least one line "
    "shipped 30+ days after order date — correlated EXISTS as a "
    "LEFT SEMI join. The date window prunes orders first; the semi "
    "join stops probing an order at its first qualifying line (no "
    "fan-out, no dedup pass); the correlation predicate rides the "
    "join condition, not a post-filter.",
)
def sql16_priority_waiting(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_shipdate"),
    )
    waited = orders.join(
        li,
        on=[
            orders["o_orderkey"] == li["o_orderkey"],
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr("INTERVAL 30 DAY"),
        ],
        how="left_semi",
    )
    return (
        waited.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "sql17_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: the pure scan-side query — every predicate "
    "(date range, discount band, quantity cap) compiles to parquet "
    "row-group pushdown, the projection reads 4 columns, and the "
    "aggregate is a map-side partial + 1-row merge. The plan IS the "
    "scan; at 100 TB this runs at storage bandwidth.",
)
def sql17_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


@register(
    "sql18_returned_topk",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape: top-20 customers by returned-item revenue. "
    "Join order follows selectivity — returned lines join date-pruned "
    "orders on the co-partition key, THEN the aggregated per-customer "
    "revenue picks up the customer and nation dims as broadcasts; "
    "aggregating before the dimension joins keeps the wide c_name "
    "column out of the big shuffle. Top-20 via per-partition heaps.",
)
def sql18_returned_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
    )
    per_cust = (
        li.join(orders, "o_orderkey")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        per_cust.join(F.broadcast(cust), "c_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "sql19_or_of_ands",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 shape: OR-of-ANDs across both join sides. The "
    "optimizer factors the single-table conjuncts out of the "
    "disjunction: part rows failing every brand/size arm and lineitem "
    "rows failing every quantity arm are dropped AT THE SCAN "
    "(CNF-extracted pushdown), so the join only sees candidate rows; "
    "the mixed residual predicate evaluates post-join. The filtered "
    "part side broadcasts.",
)
def sql19_or_of_ands(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return joined.filter(
        arm("Brand#1", 15, 1, 11)
        | arm("Brand#2", 25, 10, 20)
        | arm("Brand#3", 35, 20, 30)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# ===========================================================================
# Bounded-state heavy hitters
# ===========================================================================

@register(
    "a23_heavy_hitters_tokens",
    """
    SELECT tok AS value, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok ORDER BY cnt DESC, value LIMIT 20
    """,
    "Corpus-wide top-20 tokens with BOUNDED aggregation state: "
    "space-saving candidates per partition (<= capacity entries of "
    "state, Metwally 2005) then an exact recount of candidates only — "
    "exact whenever the 20th frequency exceeds N/capacity. This is the "
    "open-domain-key regime (tokens, URLs, n-grams) where a plain "
    "groupBy's map-side state is O(distinct) and stops fitting; "
    "capacity converts that to a constant. The recount joins a "
    "broadcast candidate list, so the second pass shuffles only "
    "surviving rows' partial counts.",
)
def a23_heavy_hitters_tokens(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sketches import heavy_hitters_topk

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    return heavy_hitters_topk(toks, "tok", k=20, capacity=4096)

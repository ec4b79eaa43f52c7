"""Batch 22 registry entries (round 6, continued): incremental
join-view maintenance from a CDC feed, corrupt-record quarantine on
ingest, and a k-anonymity generalization ladder — the maintenance,
robustness, and privacy layers of a long-lived corpus pipeline.

Reference provenance: none direct — the reference re-derives
everything from scratch each run and trusts its inputs to parse;
these are the public patterns (semi-naive incremental view
maintenance, PERMISSIVE-mode corrupt-record capture, Mondrian-style
quasi-identifier generalization) a 100 TB deployment of the same
pipeline needs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60, hash60_sql
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "i2_incremental_join_maintenance",
    "s15_corrupt_record_quarantine",
    "dq4_k_anonymity_generalize",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# I2: incremental maintenance of a join-view aggregate
# ===========================================================================
#
# The maintained view: orders joined to customer->nation, rolled up per
# nation (order count + revenue). Snapshot B derives from orders via
# the j20 bucket rules (bucket 0 deleted, bucket 1 re-priced, bucket 2
# cloned to new keys) but KEEPS o_custkey so the join column survives.
# Money is held in integer CENTS from the very first expression:
# round(x * 1.1, 2) on doubles is engine-divergent at half-cent
# boundaries (observed 1-cent drift at sf0.1), while
# (cents * 11 + 5) // 10 is exact integer HALF_UP in both engines —
# and integer cents are also what makes "old + delta == new"
# re-association exact downstream.

_I2_BUCKET = f"{hash60_sql('o_orderkey::VARCHAR')} % 10"

_I2_B_SQL = f"""
      SELECT o_orderkey, o_custkey,
             CASE WHEN {_I2_BUCKET} = 1
                  THEN (round(o_totalprice * 100)::BIGINT * 11 + 5) // 10
                  ELSE round(o_totalprice * 100)::BIGINT
             END AS cents
      FROM orders WHERE {_I2_BUCKET} <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey,
             round(o_totalprice * 100)::BIGINT + 100 AS cents
      FROM orders WHERE {_I2_BUCKET} = 2
"""


@register(
    "i2_incremental_join_maintenance",
    f"""
    WITH b AS ({_I2_B_SQL})
    SELECT n.n_name AS nation, count(*) AS n_orders,
           round(sum(b.cents) / 100.0, 2) AS revenue
    FROM b
    JOIN customer c ON b.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "Incremental view maintenance of a join-aggregate: the per-nation "
    "order-count/revenue view is NOT recomputed from snapshot B — the "
    "old view (from snapshot A) is patched with a delta aggregate "
    "built from the CDC feed alone (deleted rows contribute (-1, "
    "-cents), updates (0, new-old), inserts (+1, +cents)), then "
    "merged full-outer on the group key with zero-count groups "
    "dropped. The oracle recomputes the view directly from B; "
    "equality IS the semi-naive IVM identity. Money rides as bigint "
    "CENTS so re-associating the sum is exact, not float-lucky. At "
    "100 TB the delta relation is change-sized, the dimension join "
    "broadcasts, and the merge touches only the view's key grain — "
    "nightly cost proportional to what changed, never to the table.",
)
def i2_incremental_join_maintenance(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = F.broadcast(
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(F.col("c_custkey").alias("custkey"), F.col("n_name").alias("nation"))
    )
    a_cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    orders = orders.select(
        "o_orderkey", "o_custkey", a_cents.alias("cents")
    )

    bucket = hash60(F.col("o_orderkey").cast("string")) % 10
    b = (
        orders.filter(bucket != 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(
                bucket == 1, F.floor((F.col("cents") * 11 + 5) / 10)
            )
            .otherwise(F.col("cents"))
            .cast("bigint")
            .alias("cents"),
        )
        .union(
            orders.filter(bucket == 2).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_custkey",
                (F.col("cents") + 100).alias("cents"),
            )
        )
    )

    # the OLD materialized view: snapshot A joined + rolled up
    old_view = (
        orders.join(dim, orders["o_custkey"] == dim["custkey"])
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("cents").alias("cents"),
        )
    )

    # the CDC feed: generic full-outer snapshot diff (j20's shape),
    # custkey carried so the delta can re-join the dimension
    a_ = orders.alias("a")
    b_ = b.alias("b")
    diff = a_.join(
        b_, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    ).filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.cents") != F.col("b.cents"))
    )
    d_cnt = (
        F.when(F.col("b.o_orderkey").isNull(), -1)
        .when(F.col("a.o_orderkey").isNull(), 1)
        .otherwise(0)
    )
    d_cents = F.coalesce(F.col("b.cents"), F.lit(0)) - F.coalesce(
        F.col("a.cents"), F.lit(0)
    )
    delta = (
        diff.select(
            F.coalesce(F.col("a.o_custkey"), F.col("b.o_custkey")).alias(
                "o_custkey"
            ),
            d_cnt.alias("d_cnt"),
            d_cents.alias("d_cents"),
        )
        .join(dim, F.col("o_custkey") == dim["custkey"])
        .groupBy("nation")
        .agg(F.sum("d_cnt").alias("d_cnt"), F.sum("d_cents").alias("d_cents"))
    )

    ov = old_view.alias("ov")
    dl = delta.alias("dl")
    merged = ov.join(
        dl, F.col("ov.nation") == F.col("dl.nation"), "full_outer"
    ).select(
        F.coalesce(F.col("ov.nation"), F.col("dl.nation")).alias("nation"),
        (
            F.coalesce(F.col("ov.cnt"), F.lit(0))
            + F.coalesce(F.col("dl.d_cnt"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("ov.cents"), F.lit(0))
            + F.coalesce(F.col("dl.d_cents"), F.lit(0))
        ).alias("cents"),
    )
    return merged.filter(F.col("n_orders") > 0).select(
        "nation",
        "n_orders",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
    )


# ===========================================================================
# S15: corrupt-record quarantine on JSONL ingest
# ===========================================================================

_S15_CORRUPT_MOD = 7  # doc_id % 7 == 3 lines are truncated mid-record


def _s15_scratch() -> str:
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), f"mcyj_s15_{os.getpid()}", "landing"
    )
    os.makedirs(os.path.dirname(d), exist_ok=True)
    return d


@register(
    "s15_corrupt_record_quarantine",
    f"""
    WITH tagged AS (
      SELECT CASE WHEN doc_id % {_S15_CORRUPT_MOD} = 3
                  THEN '(quarantined)' ELSE lang END AS lang,
             CASE WHEN doc_id % {_S15_CORRUPT_MOD} = 3 THEN 0
                  ELSE n_chars END AS n_chars
      FROM documents
    )
    SELECT lang, count(*) AS n_rows, sum(n_chars)::BIGINT AS sum_chars
    FROM tagged GROUP BY lang
    """,
    "Corrupt-record quarantine: a JSONL landing batch (derived "
    f"deterministically from documents — every doc_id % "
    f"{_S15_CORRUPT_MOD} == 3 line is truncated mid-record) is read "
    "back in PERMISSIVE mode with columnNameOfCorruptRecord, malformed "
    "lines land in the quarantine bucket with their raw text preserved "
    "for replay, and clean rows aggregate per language. The oracle is "
    "closed-form over the source table (it knows exactly which lines "
    "were broken), so the check verifies Spark's corrupt-record "
    "CONTRACT itself: nothing lost, nothing misparsed, corrupt count "
    "exact. At 100 TB this is the only ingest mode that doesn't choose "
    "between FAILFAST (one bad line kills the batch) and DROPMALFORMED "
    "(silent data loss); quarantined raw lines are a delta-sized side "
    "table to repair and replay.",
)
def s15_corrupt_record_quarantine(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    corrupt = F.col("doc_id") % _S15_CORRUPT_MOD == 3
    lines = (
        docs.withColumn("line", F.to_json(F.struct("doc_id", "lang", "n_chars")))
        .select(
            F.when(
                corrupt,
                F.expr("substring(line, 1, length(line) - 5)"),
            )
            .otherwise(F.col("line"))
            .alias("value")
        )
    )
    out = _s15_scratch()
    lines.write.mode("overwrite").text(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    return (
        back.select(
            F.when(F.col("_corrupt").isNotNull(), "(quarantined)")
            .otherwise(F.col("lang"))
            .alias("lang"),
            F.when(F.col("_corrupt").isNotNull(), F.lit(0))
            .otherwise(F.col("n_chars"))
            .alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ===========================================================================
# DQ4: k-anonymity generalization ladder
# ===========================================================================

_K_ANON = 10


@register(
    "dq4_k_anonymity_generalize",
    f"""
    WITH m AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             strftime(o_orderdate, '%Y-%m') AS month,
             strftime(o_orderdate, '%Y') AS year,
             count(*) AS n
      FROM orders GROUP BY 1, 2, 3, 4
    ), ok_month AS (
      SELECT status, priority, month AS period, 'month' AS level, n
      FROM m WHERE n >= {_K_ANON}
    ), y AS (
      SELECT status, priority, year, sum(n)::BIGINT AS n
      FROM m WHERE n < {_K_ANON} GROUP BY 1, 2, 3
    ), ok_year AS (
      SELECT status, priority, year AS period, 'year' AS level, n
      FROM y WHERE n >= {_K_ANON}
    ), suppressed AS (
      SELECT status, priority, '*' AS period, 'suppressed' AS level,
             sum(n)::BIGINT AS n
      FROM y WHERE n < {_K_ANON} GROUP BY 1, 2
    )
    SELECT * FROM ok_month
    UNION ALL SELECT * FROM ok_year
    UNION ALL SELECT * FROM suppressed
    """,
    f"k-anonymity generalization ladder (k={_K_ANON}): quasi-identifier "
    "groups (status, priority, order month) that meet k publish at "
    "month grain; under-k groups generalize to year grain; groups "
    "STILL under k suppress their period entirely — the Mondrian-style "
    "coarsen-until-safe pass a corpus release runs over its metadata "
    "before publishing. The whole ladder operates on the month-grain "
    "GROUP relation (one partial-aggregating scan of the data, "
    "everything after is group-grain rollups), so generalization "
    "never re-touches rows. Every row is accounted for exactly once "
    "across the three rungs — the invariant test sums the levels back "
    "to the table count.",
)
def dq4_k_anonymity_generalize(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    m = (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.date_format("o_orderdate", "yyyy").alias("year"),
        )
        .groupBy("status", "priority", "month", "year")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    ok_month = m.filter(F.col("n") >= _K_ANON).select(
        "status",
        "priority",
        F.col("month").alias("period"),
        F.lit("month").alias("level"),
        "n",
    )
    y = (
        m.filter(F.col("n") < _K_ANON)
        .groupBy("status", "priority", "year")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint(eager=False)
    )
    ok_year = y.filter(F.col("n") >= _K_ANON).select(
        "status",
        "priority",
        F.col("year").alias("period"),
        F.lit("year").alias("level"),
        "n",
    )
    suppressed = (
        y.filter(F.col("n") < _K_ANON)
        .groupBy("status", "priority")
        .agg(F.sum("n").alias("n"))
        .select(
            "status",
            "priority",
            F.lit("*").alias("period"),
            F.lit("suppressed").alias("level"),
            "n",
        )
    )
    return ok_month.unionByName(ok_year).unionByName(suppressed)

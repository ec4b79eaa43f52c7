"""Batch 17 registry entries (round 6, continued): snapshot-diff CDC
classification, small-file compaction round trip, and the nightly
corpus datasheet DELTA report.

Reference provenance: the reference maintains its corpus by full
re-export and eyeballing counts; these add the operational layer a
scheduled 100 TB pipeline actually runs — "what changed between
snapshots, row by row", "rewrite the fragmented partition", "diff the
datasheet, not just the corpus" — each as a declarative DataFrame plan
with a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60_sql
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# J20: snapshot diff / CDC classification
# ===========================================================================
#
# Snapshot B is derived deterministically from orders (the A snapshot):
# key-hash bucket 0 rows are deleted, bucket-1 rows carry a re-priced
# payload, and bucket-2 rows are cloned to fresh keys (inserts). The
# diff itself is the production shape: full outer join on the key,
# classify by side-presence and payload equality.

# Payloads are derived in integer CENTS: round(x * 1.1, 2) on doubles
# is engine-divergent at half-cent boundaries (a 1-cent drift appears
# at sf0.1), while (cents * 11 + 5) // 10 is exact HALF_UP integer
# arithmetic in both engines. Prices render back as cents / 100.0.
_J20_B_SQL = f"""
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN {hash60_sql("o_orderkey::VARCHAR")} % 10 = 1
                  THEN ((round(o_totalprice * 100)::BIGINT * 11 + 5) // 10)
                       / 100.0
                  ELSE round(o_totalprice * 100)::BIGINT / 100.0
             END AS o_totalprice
      FROM orders
      WHERE {hash60_sql("o_orderkey::VARCHAR")} % 10 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_orderstatus,
             (round(o_totalprice * 100)::BIGINT + 100) / 100.0
      FROM orders
      WHERE {hash60_sql("o_orderkey::VARCHAR")} % 10 = 2
"""


@register(
    "j20_snapshot_diff_cdc",
    f"""
    WITH a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), b AS ({_J20_B_SQL})
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'deleted'
                WHEN a.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS change_type,
           a.o_totalprice AS old_price,
           b.o_totalprice AS new_price
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_orderstatus <> b.o_orderstatus
    ORDER BY o_orderkey
    """,
    "Snapshot-diff CDC: two table snapshots full-outer-join on the key "
    "and every row classifies as deleted / inserted / updated (payload "
    "inequality) — unchanged rows drop out, so the emitted change feed "
    "is delta-sized, not snapshot-sized. The B snapshot derives "
    "deterministically from orders via the shared key hash (bucket 0 "
    "deleted, bucket 1 re-priced, bucket 2 cloned to fresh keys), so "
    "both engines diff identical inputs. At 100 TB both sides are "
    "bucketed on the key and the join is shuffle-free; the payload "
    "compare touches only co-located rows. This is the batch twin of "
    "j11/j12's merge-upsert: those APPLY a change feed, this DERIVES "
    "one.",
)
def j20_snapshot_diff_cdc(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.hashing import hash60

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    bucket = hash60(F.col("o_orderkey").cast("string")) % 10
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    b = (
        orders.filter(bucket != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (
                F.when(
                    bucket == 1,
                    F.floor((cents * 11 + 5) / 10).cast("bigint"),
                ).otherwise(cents)
                / 100.0
            ).alias("o_totalprice"),
        )
        .union(
            orders.filter(bucket == 2).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_orderstatus",
                ((cents + 100) / 100.0).alias("o_totalprice"),
            )
        )
    )
    a = orders.alias("a")
    bb = b.alias("b")
    j = a.join(
        bb, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("b.o_orderkey").isNull(), "deleted")
        .when(F.col("a.o_orderkey").isNull(), "inserted")
        .otherwise("updated")
    )
    return (
        j.filter(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            change.alias("change_type"),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
        .orderBy("o_orderkey")
    )


# ===========================================================================
# O13: small-file compaction round trip
# ===========================================================================

@register(
    "o13_compaction_roundtrip",
    """
    SELECT l_returnflag,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "Small-file compaction: lineitem is first written deliberately "
    "fragmented (64 shuffled output files), then rewritten with "
    "repartition(4) — the maintenance job every long-lived 100 TB "
    "table needs, since tiny files destroy scan throughput (per-file "
    "open/footer cost) and overload the listing. The returned "
    "aggregate proves content survives both rewrites bit-for-bit "
    "against the source-table oracle; tests/test_batch17.py "
    "additionally asserts the compacted directory really holds <= 4 "
    "data files and the fragmented one >= 32. repartition (shuffle), "
    "not coalesce: coalesce(4) would collapse the UPSTREAM write's "
    "parallelism into 4 tasks, while the shuffle keeps the read wide "
    "and only the final write narrow.",
)
def o13_compaction_roundtrip(spark, sf_dir):
    import os

    from mcyj_datapipeline_spark.registry_batch3 import _session_scratch

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    frag = os.path.join(_session_scratch("compact"), "fragmented")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    compacted = os.path.join(_session_scratch("compact"), "compacted")
    (
        spark.read.parquet(frag)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(compacted)
    )
    back = spark.read.parquet(compacted)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# ===========================================================================
# E15: corpus datasheet DELTA between two snapshots
# ===========================================================================

@register(
    "e15_datasheet_delta",
    """
    WITH tagged AS (
      SELECT lang,
             (doc_id < 450) AS in_old,
             (doc_id >= 50) AS in_new,
             len(list_filter(string_split_regex(text, '\\s+'),
                             t -> t <> '')) AS n_tok
      FROM documents
    )
    SELECT lang,
           count(*) FILTER (in_old) AS n_docs_old,
           count(*) FILTER (in_new) AS n_docs_new,
           count(*) FILTER (in_new AND NOT in_old) AS docs_added,
           count(*) FILTER (in_old AND NOT in_new) AS docs_removed,
           sum(CASE WHEN in_old THEN n_tok ELSE 0 END)::BIGINT
             AS tokens_old,
           sum(CASE WHEN in_new THEN n_tok ELSE 0 END)::BIGINT
             AS tokens_new,
           (sum(CASE WHEN in_new THEN n_tok ELSE 0 END)
            - sum(CASE WHEN in_old THEN n_tok ELSE 0 END))::BIGINT
             AS token_delta
    FROM tagged WHERE in_old OR in_new
    GROUP BY lang ORDER BY lang
    """,
    "Corpus datasheet DELTA: the per-language growth-accounting report "
    "a nightly pipeline publishes next to E14's absolute datasheet — "
    "docs/tokens per snapshot, added/removed counts, token drift. "
    "Snapshots here are doc_id slices (old < 450, new >= 50, the "
    "incremental-dedup convention), so membership is a per-row "
    "predicate and the WHOLE report is ONE conditional-aggregation "
    "scan — no join, no second pass. With physically separate "
    "snapshot tables the j20 full-outer-join derives the same tagged "
    "relation and this exact rollup consumes it unchanged.",
)
def e15_datasheet_delta(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        "lang",
        (F.col("doc_id") < 450).alias("in_old"),
        (F.col("doc_id") >= 50).alias("in_new"),
        F.size(TA.tokens(F.col("text"))).alias("n_tok"),
    ).filter(F.col("in_old") | F.col("in_new"))
    zero = F.lit(0)
    tok = lambda flag: F.sum(  # noqa: E731
        F.when(F.col(flag), F.col("n_tok")).otherwise(zero)
    )
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.when(F.col("in_old"), 1)).alias("n_docs_old"),
            F.count(F.when(F.col("in_new"), 1)).alias("n_docs_new"),
            F.count(
                F.when(F.col("in_new") & ~F.col("in_old"), 1)
            ).alias("docs_added"),
            F.count(
                F.when(F.col("in_old") & ~F.col("in_new"), 1)
            ).alias("docs_removed"),
            tok("in_old").alias("tokens_old"),
            tok("in_new").alias("tokens_new"),
            (tok("in_new") - tok("in_old")).alias("token_delta"),
        )
        .orderBy("lang")
    )

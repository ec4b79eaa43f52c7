"""Batch 29 registry entries (round 6, continued): experiment
analysis (two-proportion A/B z-test), order-independent table
fingerprints for snapshot equality, and a measured recall evaluation
of the MinHash-LSH screen against its exact ground truth.

Reference provenance: none direct — these are the measurement layers
around the pipeline: "did the variant move conversion" (the classic
pooled two-proportion z), "are these two table copies identical
without sorting either" (migration/backup verification), and "how
much recall does the LSH banding actually give up at this threshold"
(the number the dedup family's docs cite but nothing computed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.operators.hashing import hash60, hash60_sql
from mcyj_datapipeline_spark.registry import (
    _minhash_oracle_sql as _mh_sql,
)
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "ab_conversion_ztest",
    "dq6_table_fingerprint",
    "dedup_minhash_eval",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# A/B experiment analysis
# ===========================================================================

_AB_HASH = hash60_sql("user_id::VARCHAR")


@register(
    "ab_conversion_ztest",
    f"""
    WITH totals AS (
      SELECT user_id,
             round(sum(CASE WHEN event_type = 'purchase'
                            THEN value ELSE 0 END), 2) AS spend
      FROM events GROUP BY user_id
    ), med AS (
      SELECT quantile_cont(spend, 0.5) AS m FROM totals
    ), per AS (
      SELECT CASE WHEN {_AB_HASH} % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             count(*) AS n_users,
             count(*) FILTER (WHERE spend > (SELECT m FROM med))
               AS n_converted
      FROM totals GROUP BY 1
    ), z AS (
      SELECT round(
               (a.n_converted::DOUBLE / a.n_users
                - b.n_converted::DOUBLE / b.n_users)
               / nullif(sqrt(
                   ((a.n_converted + b.n_converted)::DOUBLE
                      / (a.n_users + b.n_users))
                   * (1 - (a.n_converted + b.n_converted)::DOUBLE
                        / (a.n_users + b.n_users))
                   * (1.0 / a.n_users + 1.0 / b.n_users)
                 ), 0), 6) AS z_score
      FROM per a JOIN per b ON a.variant = 'A' AND b.variant = 'B'
    )
    SELECT variant, n_users, n_converted,
           round(n_converted::DOUBLE / n_users, 6) AS conv_rate, z_score
    FROM per CROSS JOIN z ORDER BY variant
    """,
    "A/B experiment readout: users hash-assign to variants (the "
    "deterministic bucketing real experiment platforms use), "
    "conversion = per-user purchase spend above the corpus median "
    "user (balanced by construction, so the proportion is never "
    "degenerate at any scale), and the pooled two-proportion z-score "
    "rides both variant rows — the launch/no-launch number. One "
    "user-key rollup, one exact median over the user-grain relation, "
    "then everything is 2-row relations; the z arithmetic is a "
    "broadcast self-join of the 2-row table with the zero-variance "
    "denominator nullif-guarded identically on both engines. At "
    "100 TB: one key shuffle plus a user-grain median "
    "(approx_percentile slots in, nothing else changes).",
)
def ab_conversion_ztest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    totals = (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("spend")
        )
        .localCheckpoint(eager=False)
    )
    med = totals.agg(F.expr("percentile(spend, 0.5)").alias("m"))
    per = (
        totals.crossJoin(F.broadcast(med))
        .select(
            F.when(
                hash60(F.col("user_id").cast("string")) % 2 == 0, "A"
            )
            .otherwise("B")
            .alias("variant"),
            (F.col("spend") > F.col("m")).alias("conv"),
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count(F.when(F.col("conv"), 1)).alias("n_converted"),
        )
        .localCheckpoint(eager=False)
    )
    a = per.filter(F.col("variant") == "A").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = per.filter(F.col("variant") == "B").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    z = a.crossJoin(b).select(
        F.round(
            (
                F.col("ca") / F.col("na") - F.col("cb") / F.col("nb")
            )
            / F.nullif(
                F.sqrt(
                    pooled
                    * (1 - pooled)
                    * (1.0 / F.col("na") + 1.0 / F.col("nb"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score")
    )
    return (
        per.crossJoin(F.broadcast(z))
        .select(
            "variant",
            "n_users",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_users"), 6).alias(
                "conv_rate"
            ),
            "z_score",
        )
        .orderBy("variant")
    )


# ===========================================================================
# Order-independent table fingerprints
# ===========================================================================


def _orders_canon_sql(mutate: bool) -> str:
    cents = "round(o_totalprice * 100)::BIGINT"
    if mutate:
        cents = (
            f"CASE WHEN {hash60_sql('o_orderkey::VARCHAR')} % 10 = 1 "
            f"THEN ({cents} * 11 + 5) // 10 ELSE {cents} END"
        )
    return (
        "SELECT o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' "
        f"|| ({cents})::VARCHAR || '|' || o_orderstatus AS canon FROM orders"
    )


@register(
    "dq6_table_fingerprint",
    f"""
    WITH f1 AS (
      SELECT 'orders' AS tbl, count(*) AS n_rows,
             bit_xor({hash60_sql("canon")}) AS fingerprint
      FROM ({_orders_canon_sql(False)})
    ), f2 AS (
      SELECT 'orders_repriced' AS tbl, count(*) AS n_rows,
             bit_xor({hash60_sql("canon")}) AS fingerprint
      FROM ({_orders_canon_sql(True)})
    ), f3 AS (
      SELECT 'customer' AS tbl, count(*) AS n_rows,
             bit_xor({hash60_sql(
                 "c_custkey::VARCHAR || '|' || c_name || '|' "
                 "|| c_nationkey::VARCHAR"
             )}) AS fingerprint
      FROM customer
    )
    SELECT tbl, n_rows, fingerprint,
           fingerprint <> (SELECT fingerprint FROM f1) AS differs_from_orders
    FROM (SELECT * FROM f1 UNION ALL SELECT * FROM f2
          UNION ALL SELECT * FROM f3)
    ORDER BY tbl
    """,
    "Order-independent table fingerprints: each row canonicalizes to "
    "a typed string (money as integer cents — float rendering is "
    "engine-divergent, cents are not), hashes through the shared "
    "md5-60 construction, and the table collapses to ONE xor-"
    "aggregate cell — byte-order-free, partition-order-free, "
    "mergeable (xor of partial xors), so two 100 TB table copies "
    "compare by exchanging 8 bytes each. The repriced variant "
    "(same derivation as the CDC family's bucket-1 mutation) must "
    "and does fingerprint differently — the report carries the "
    "comparison bit. This is the migration/backup equality check "
    "run without sorting or co-locating either side.",
)
def dq6_table_fingerprint(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    mut_cents = F.when(
        hash60(F.col("o_orderkey").cast("string")) % 10 == 1,
        F.floor((cents * 11 + 5) / 10).cast("bigint"),
    ).otherwise(cents)

    def canon(cents_col):
        return F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            cents_col.cast("string"),
            F.col("o_orderstatus"),
        )

    def fp(df, canon_col, name):
        return df.select(canon_col.alias("canon")).agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(hash60(F.col("canon"))).alias("fingerprint"),
        )

    cust = _t(spark, sf_dir, "customer")
    c_canon = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
    )
    f1 = fp(orders, canon(cents), "orders").localCheckpoint(eager=False)
    f2 = fp(orders, canon(mut_cents), "orders_repriced")
    f3 = fp(cust, c_canon, "customer")
    base = f1.select(F.col("fingerprint").alias("_base"))
    return (
        f1.unionByName(f2)
        .unionByName(f3)
        .crossJoin(F.broadcast(base))
        .select(
            "tbl",
            "n_rows",
            "fingerprint",
            (F.col("fingerprint") != F.col("_base")).alias(
                "differs_from_orders"
            ),
        )
        .orderBy("tbl")
    )


# ===========================================================================
# MinHash-LSH recall evaluation against exact ground truth
# ===========================================================================

_EVAL_THRESHOLD = 0.8


def _exact_pairs_sql(threshold: float) -> str:
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(w[i:i+2], ' ')
                            for i in range(1, len(w) - 1)]) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      WHERE len(w) >= 3
    ), inv AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh
    ), shared AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
      FROM inv x JOIN inv y ON x.shingle = y.shingle
                           AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b
    FROM shared s JOIN sh a ON s.id_a = a.doc_id
                  JOIN sh b ON s.id_b = b.doc_id
    WHERE s.shared::DOUBLE / (len(a.sh) + len(b.sh) - s.shared)
          >= {threshold}
    """


@register(
    "dedup_minhash_eval",
    f"""
    WITH exact AS ({_exact_pairs_sql(_EVAL_THRESHOLD)}),
    lsh AS (SELECT id_a, id_b FROM ({_mh_sql()})),
    common AS (
      SELECT count(*) AS n FROM exact e
      WHERE EXISTS (SELECT 1 FROM lsh l
                    WHERE l.id_a = e.id_a AND l.id_b = e.id_b)
    )
    SELECT (SELECT count(*) FROM exact) AS n_exact,
           (SELECT count(*) FROM lsh) AS n_lsh,
           (SELECT n FROM common) AS n_common,
           round((SELECT n FROM common)::DOUBLE
                 / nullif((SELECT count(*) FROM exact), 0), 6) AS recall,
           round((SELECT n FROM common)::DOUBLE
                 / nullif((SELECT count(*) FROM lsh), 0), 6) AS precision
    """,
    "Measured recall/precision of the MinHash-LSH near-dup screen "
    f"against exact trigram Jaccard at threshold {_EVAL_THRESHOLD} — "
    "the number the LSH banding configuration (16 perms, 4 bands) "
    "actually delivers, computed instead of cited. Both pair sets "
    "come from already-oracle-proven operators over the SAME shingle "
    "definition; the eval is two pair-key semi-joins and a one-row "
    "report. Precision is 1.0 by construction (the LSH path verifies "
    "candidates with exact Jaccard before emitting) — asserted in "
    "tests — so the interesting number is recall: pairs whose "
    "signatures never collided in any band. At 100 TB you run this "
    "on a sampled slice to re-tune banding after a corpus shift.",
)
def dedup_minhash_eval(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # Exact spine via PREFIX FILTERING (r10) — same output as the
    # brute shared-shingle join by theorem (its own oracle-proven
    # query pins that), but the inverted index holds only each doc's
    # |r|-ceil(0.8|r|)+1 rarest shingles, so the self-join fan-out
    # that made this the bench's heaviest sf1 query never forms.
    # Each spine shingles from text INDEPENDENTLY — the r10-interim
    # "share one persisted shingle relation" shape was measured and
    # REVERSED: caching 2.6M string arrays costs 15 s at sf1 while a
    # full re-shingle text pass costs ~4 s, so the share was a
    # pessimization (20.3 s benched with share vs 6.5 s without,
    # min-of-3 single session). DataFrame-caching wide string-array
    # columns is how you LOSE time on this engine.
    exact = D.prefix_filter_jaccard_pairs(
        docs, threshold=_EVAL_THRESHOLD
    ).select("id_a", "id_b")
    lsh = D.minhash_lsh_pairs(
        docs, jaccard_threshold=_EVAL_THRESHOLD
    ).select("id_a", "id_b")
    exact = exact.localCheckpoint(eager=False)
    lsh = lsh.localCheckpoint(eager=False)
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_common = exact.join(lsh, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_lsh))
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            F.round(
                F.col("n_common")
                / F.nullif(F.col("n_exact").cast("double"), F.lit(0.0)),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_common")
                / F.nullif(F.col("n_lsh").cast("double"), F.lit(0.0)),
                6,
            ).alias("precision"),
        )
    )

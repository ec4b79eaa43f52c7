"""Batch 7 registry entries (round 3): bloom-filter incremental dedup
screening (bounded-size broadcast bitmap instead of an unbounded key
set), more TPC-H optimizer shapes (Q14/Q15/Q17/Q18/Q12 analogs adapted
to the testdata columns), a broadcast band join, and a corpus-trained
character-bigram log-probability quality score.

Reference provenance: incremental screening generalizes the reference's
"new = all - already_done" pattern (run_full_pipeline.py:44-61,
download_all_pdfs.py:124-255); the SQL shapes widen the analytic
surface the dashboard aggregations imply (generate_website_data.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Bloom-filter incremental dedup screen
# ===========================================================================

#: Bloom geometry for the registry query: m bits / k hash functions.
#: m/64 longs is the hard ceiling on the bitmap's broadcast size —
#: 2^16 bits = 1 KiB here (test scale); at 100 TB you size m to the
#: expected distinct count (1e9 keys, 1% fp -> ~1.2 GiB of bitmap,
#: still a bounded broadcast where the distinct-key SET would be 32 GB+
#: and keep growing).
_BLOOM_M_BITS = 1 << 16
_BLOOM_K = 4


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int = _BLOOM_M_BITS,
                 k: int = _BLOOM_K) -> DataFrame:
    """Distributed bloom-filter build: (word_idx, bits) rows, one row
    per set 64-bit word, via a map-side-combining ``bit_or`` aggregate.

    The output has at most ``m_bits/64`` rows NO MATTER how many input
    keys — that bound is the whole point: the screen stays
    broadcastable when the corpus key set no longer is. Spark's
    built-in ``bloom_filter_agg`` exists but is not SQL-registered in
    OSS builds, so the bitmap is composed from public primitives
    (xxhash64 seeds, shiftleft, bit_or) and stays inside codegen.
    """
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
                for j in range(k)
            ]
        )
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_screen_new(batch: DataFrame, corpus_keys: DataFrame,
                     key_col: str, m_bits: int = _BLOOM_M_BITS,
                     k: int = _BLOOM_K,
                     bitmap: DataFrame | None = None) -> DataFrame:
    """Incremental dedup with a bloom pre-screen: return the batch rows
    whose ``key_col`` is NOT present in ``corpus_keys``.

    Two-phase, exact:

    1. **Screen (map-side):** probe the broadcast bitmap; a row whose k
       probe bits are not all set is DEFINITELY new — it never enters
       the anti-join shuffle. With a well-sized bloom that is ~99% of a
       mostly-new batch.
    2. **Confirm (shuffle, maybes only):** bloom positives are only
       *maybe* duplicates (false-positive rate ~(1-e^{-kn/m})^k), so
       they — and only they — are confirmed by the exact left-anti
       join against the corpus keys.

    definite_new UNION confirmed_new == the exact anti-join result,
    which is what the DuckDB oracle checks. At 100 TB the anti-join
    probe side shrinks from |batch| to |dups| + fp x |batch|.

    Pass a persisted ``bitmap`` (built by :func:`bloom_bitmap` /
    merged by ``operators.sketches.bloom_merge`` over the SAME
    geometry) to skip rebuilding it from ``corpus_keys`` — the
    incremental path, where the bitmap is state maintained across
    runs. The bitmap may be STALE-SUPERSET-free but never miss a
    corpus key; a merged-in key that was later removed from the
    corpus only costs a false positive (resolved by the confirm
    join), so bitmap maintenance never needs deletions.
    """
    if bitmap is None:
        bitmap = bloom_bitmap(corpus_keys, key_col, m_bits, k)
    probes = batch.select(
        F.struct("*").alias("_row"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits)
                    )
                    for j in range(k)
                ]
            )
        ).alias("pos"),
    ).select(
        "_row",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
    )
    flagged = (
        probes.join(F.broadcast(bitmap), "word_idx", "left")
        .select(
            "_row",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("hit"),
        )
        .groupBy("_row")
        .agg(F.every("hit").alias("maybe_dup"))
    )
    definite_new = flagged.filter(~F.col("maybe_dup")).select("_row.*")
    maybes = flagged.filter(F.col("maybe_dup")).select("_row.*")
    confirmed_new = maybes.join(
        corpus_keys.select(key_col).distinct(), key_col, "left_anti"
    )
    return definite_new.unionByName(confirmed_new)


@register(
    "dedup_bloom_screen",
    """
    SELECT b.doc_id, md5(b.text) AS digest
    FROM documents b
    WHERE b.doc_id % 4 = 0
      AND NOT EXISTS (
        SELECT 1 FROM documents c
        WHERE c.doc_id % 4 <> 0 AND md5(c.text) = md5(b.text)
      )
    ORDER BY b.doc_id
    """,
    "Incremental dedup with a bloom-filter pre-screen: the corpus's "
    "content digests fold into a fixed-size bit_or bitmap (<= m/64 "
    "rows regardless of corpus size), the new batch probes it "
    "broadcast-map-side, and only bloom POSITIVES pay the exact "
    "anti-join shuffle. Exactness is restored by the confirm join, so "
    "the result equals the plain anti-join the oracle runs — the bloom "
    "only decides who shuffles. The 100 TB story: a 1e9-key corpus "
    "needs a ~1 GiB bitmap broadcast where the distinct-key set would "
    "be tens of GB and growing.",
)
def dedup_bloom_screen(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return bloom_screen_new(batch, corpus, "digest").orderBy("doc_id")


# ===========================================================================
# TPC-H optimizer shapes (adapted to the testdata's columns)
# ===========================================================================

@register(
    "sql10_promo_revenue",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4
           ) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    """,
    "TPC-H Q14 shape: promotional revenue share over a ship-date "
    "window. The date filter prunes the fact scan FIRST (pushed to "
    "parquet row groups), the part dimension broadcasts (only "
    "p_type is read thanks to column pruning), and the two sums fold "
    "into one conditional aggregate pass — a single scan, a single "
    "broadcast, zero wide shuffles at any scale.",
)
def sql10_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), "l_partkey").agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "sql11_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1995-07-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 shape: supplier(s) with maximum quarter revenue — the "
    "view + scalar-max-subquery pattern. The revenue rollup happens "
    "ONCE (cached single-pass aggregate reused for both the max and "
    "the probe), the 1-row max broadcasts into the filter, and the "
    "supplier dimension joins broadcast. No re-aggregation, no global "
    "sort until the final tiny result.",
)
def sql11_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("_mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "sql12_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.half_avg
    """,
    "TPC-H Q17 shape: revenue from below-half-average-quantity line "
    "items. The correlated per-part scalar subquery decorrelates into "
    "one grouped pre-aggregate joined back to the fact — the classic "
    "rewrite that turns O(parts) subquery executions into a single "
    "shuffle on l_partkey; AQE picks broadcast for the per-part "
    "averages when they fit.",
)
def sql12_small_qty_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "sql13_big_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate, round(o.o_totalprice, 2) AS price,
           round(t.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150) t
      ON o.o_orderkey = t.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    "TPC-H Q18 shape: large-volume orders — IN (GROUP BY ... HAVING "
    "sum > N) rewritten as join-to-pre-aggregate. The HAVING filter "
    "runs inside the aggregate (few survivors), so the join probe "
    "side is tiny and AQE broadcasts it; the top-20 is a "
    "TakeOrderedAndProject (per-partition heaps + driver merge of 20 "
    "rows), never a global sort.",
)
def sql13_big_orders(spark, sf_dir):
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return (
        orders.join(big, "o_orderkey")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("price"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "sql14_priority_shipping",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "TPC-H Q12 shape: shipping lines split by order urgency — join "
    "then conditional two-way count in ONE aggregate pass. The "
    "lineitem date filter prunes before the join; the join is on the "
    "natural co-partition key (orderkey) so a bucketed/co-located "
    "layout makes it shuffle-free; the grouped output is 3 rows.",
)
def sql14_priority_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp")
    ).select(F.col("l_orderkey").alias("o_orderkey"), "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ===========================================================================
# Broadcast band join
# ===========================================================================

@register(
    "j17_band_join_price_tier",
    """
    WITH tiers(tier, lo, hi) AS (
      VALUES ('BUDGET', 0.0, 50000.0),
             ('MID', 50000.0, 150000.0),
             ('PREMIUM', 150000.0, 300000.0),
             ('LUXURY', 300000.0, 1e18)
    )
    SELECT t.tier, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN tiers t
      ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
    GROUP BY t.tier
    """,
    "Band (range) join: facts against a small interval-keyed dimension "
    "via a broadcast non-equi join — Spark executes it as "
    "BroadcastNestedLoopJoin over the 4-row tier table, i.e. a "
    "map-side interval probe, NOT a shuffled cross product. The "
    "pattern generalizes to any piecewise bucketing (tax brackets, "
    "SLA windows, date calendars); when the dimension is too big to "
    "broadcast, the scale path is binning both sides to an equi-key "
    "first (as the as-of join operator here does).",
)
def j17_band_join_price_tier(spark, sf_dir):
    tiers = F.broadcast(
        _t(spark, sf_dir, "orders").sparkSession.createDataFrame(
            [
                ("BUDGET", 0.0, 50_000.0),
                ("MID", 50_000.0, 150_000.0),
                ("PREMIUM", 150_000.0, 300_000.0),
                ("LUXURY", 300_000.0, 1e18),
            ],
            "tier string, lo double, hi double",
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_totalprice")
    return (
        orders.join(
            tiers,
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ===========================================================================
# Corpus-trained character-bigram LM score (perplexity-proxy filter)
# ===========================================================================

def _bigram_count_kernel(batches):
    """Arrow-batched per-doc character-bigram counter: one row per
    (doc, distinct bigram CODE) with its instance count. Bigram
    identity is the codepoint pair a*0x110000+b from the utf-32
    encoding — bijective, and codepoint (not UTF-16 code unit)
    granularity is exactly the oracle's substring semantics. All the
    per-character work is numpy (C speed); the JVM alternatives are
    interpreted per element — zip_with(concat) over every char pair
    measured ~7 s per pass at sf1 (and the plan needs two passes),
    vs well under 1 s for this kernel."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        ids, codes, cnts = [], [], []
        for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
            if t is None or len(t) < 2:
                continue
            a = np.frombuffer(t.encode("utf-32-le"), dtype="<u4")
            bc = a[:-1].astype(np.int64) * 0x110000 + a[1:]
            u, c = np.unique(bc, return_counts=True)
            ids.append(np.full(len(u), doc_id, dtype=np.int64))
            codes.append(u)
            cnts.append(c.astype(np.float64))
        if ids:
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "g": np.concatenate(codes),
                    "c": np.concatenate(cnts),
                }
            )


@register(
    "text_bigram_logprob",
    """
    WITH grams AS (
      SELECT doc_id,
             unnest([substring(lower(text), i, 2)
                     for i in range(1, len(text)) if len(text) >= 2]) AS g
      FROM documents
    ),
    counts AS (SELECT g, count(*)::DOUBLE AS c FROM grams GROUP BY g),
    total AS (SELECT sum(c) AS n FROM counts),
    scored AS (
      SELECT gr.doc_id, log2(ct.c / t.n) AS lp
      FROM grams gr, counts ct, total t
      WHERE gr.g = ct.g
    )
    SELECT doc_id, round(avg(lp), 6) AS avg_log2p, count(*) AS n_bigrams
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "Perplexity-proxy quality score: train a character-bigram unigram "
    "model on the corpus itself (one explode+count pass), then score "
    "each document by its mean log2 bigram probability — junk (random "
    "bytes, rare-script spam) scores far below fluent text. The bigram "
    "vocabulary is bounded (alphabet^2), so the trained model "
    "BROADCASTS no matter the corpus size; scoring is one map-side "
    "join + per-doc aggregate. The same two-pass shape extends to "
    "word-level LMs with a hashed vocabulary cap.",
)
def text_bigram_logprob(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    # Per-doc bigram counts from ONE vectorized Arrow pass (kernel
    # above), then everything downstream is declarative and
    # shuffle-light (r8; the r7 form's groupBy(doc_id, g) Exchange
    # moved docs x vocab-per-doc string rows — the measured exp-0.87
    # bottleneck — and every pure-builtin alternative pays the
    # interpreted higher-order-function tax per CHARACTER):
    #   * model: groupBy(code) over per-doc counts partial-aggregates
    #     to <= alphabet^2 rows per partition — broadcastable at any
    #     corpus size;
    #   * scoring: broadcast-join per-doc counts to the model
    #     (map-side), weighted per-doc aggregate partial-aggregates
    #     to ONE row per doc per partition.
    # Total shuffle: O(docs + alphabet^2) rows, no strings anywhere
    # (bigram identity is an 8-byte codepoint-pair code).
    gc = docs.mapInPandas(
        _bigram_count_kernel, "doc_id long, g long, c double"
    )
    counts = gc.groupBy("g").agg(F.sum("c").alias("cg"))
    total = counts.agg(F.sum("cg").alias("n"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "g", F.log2(F.col("cg") / F.col("n")).alias("lp")
    )
    return (
        gc.join(F.broadcast(model), "g")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("c") * F.col("lp")) / F.sum("c"), 6
            ).alias("avg_log2p"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )

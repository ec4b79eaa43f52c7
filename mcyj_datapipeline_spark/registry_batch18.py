"""Batch 18 registry entries (round 6, continued): two more mergeable
sketches — count-min heavy-hitter estimation and KMV set-similarity —
plus the LSH banding tuning report that operationalizes the MinHash
pipeline.

Reference provenance: the reference counts things exactly and tunes
nothing; these add the bounded-state estimation layer (the HLL/a04
pattern, extended to frequency and set overlap) and the diagnostics an
operator reads before turning the dedup knobs on 100 TB. All sketches
are built from the shared deterministic md5 hash, so every estimate is
a pure function of the data and the DuckDB oracle verifies the sketch
VALUES, not just bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60, hash60_sql
from mcyj_datapipeline_spark.registry import register

_CMS_DEPTH = 4
_CMS_WIDTH = 64
_KMV_K = 64
_TWO60 = float(1 << 60)


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# SK: count-min sketch heavy hitters
# ===========================================================================

def _cms_oracle_sql() -> str:
    h = hash60_sql("(r.row_id::VARCHAR || ':' || t.term)")
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), occ AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    rows_ AS (SELECT unnest(range({_CMS_DEPTH})) AS row_id),
    cells AS (
      SELECT r.row_id, {h} % {_CMS_WIDTH} AS bucket, t.term, t.c
      FROM occ t, rows_ r
    ), counters AS (
      SELECT row_id, bucket, sum(c) AS total
      FROM cells GROUP BY row_id, bucket
    ), est AS (
      SELECT ce.term, min(co.total) AS cms_est
      FROM cells ce JOIN counters co
        ON co.row_id = ce.row_id AND co.bucket = ce.bucket
      GROUP BY ce.term
    )
    SELECT o.term, o.c AS exact_count, e.cms_est::BIGINT AS cms_est,
           (e.cms_est - o.c)::BIGINT AS overestimate
    FROM occ o JOIN est e ON e.term = o.term
    ORDER BY o.c DESC, o.term LIMIT 10
    """


@register(
    "sk_count_min_heavy_hitters",
    _cms_oracle_sql(),
    f"Count-min sketch ({_CMS_DEPTH} rows x {_CMS_WIDTH} buckets) over "
    "the token stream, read back for the top-10 exact heavy hitters "
    "with the overestimate each suffered — the bounded-state frequency "
    "sketch that pairs with HLL's bounded-state cardinality (a04/sk_ "
    "family). The ENTIRE stream collapses into 256 mergeable counter "
    "cells (partial-aggregating groupBy — per-partition sketches sum "
    "cell-wise, the same merge a streaming or multi-day rollup needs); "
    "point queries join the vocabulary-sized term relation against the "
    "256-row counter table and take the min across rows. Row hashes "
    "come from the shared md5 construction, so the oracle verifies the "
    "exact sketch VALUES; CMS >= exact is additionally asserted as an "
    "invariant test.",
)
def sk_count_min_heavy_hitters(spark, sf_dir):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = _t(spark, sf_dir, "documents")
    occ = (
        docs.select(F.explode(TA.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])
    ).alias("row_id")
    cells = occ.select("term", "c", rows).withColumn(
        "bucket",
        hash60(
            F.concat(
                F.col("row_id").cast("string"), F.lit(":"), F.col("term")
            )
        )
        % _CMS_WIDTH,
    )
    counters = cells.groupBy("row_id", "bucket").agg(
        F.sum("c").alias("total")
    )
    est = (
        cells.join(F.broadcast(counters), ["row_id", "bucket"])
        .groupBy("term")
        .agg(F.min("total").alias("cms_est"))
    )
    return (
        occ.join(est, "term")
        .select(
            "term",
            F.col("c").alias("exact_count"),
            F.col("cms_est"),
            (F.col("cms_est") - F.col("c")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), F.asc("term"))
        .limit(10)
    )


# ===========================================================================
# SK: KMV (k minimum values) set-similarity sketch
# ===========================================================================

def _kmv_oracle_sql() -> str:
    h = hash60_sql("user_id::VARCHAR")
    return f"""
    WITH ua AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase'),
    ub AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    ha AS (SELECT {h} AS h FROM ua ORDER BY h LIMIT {_KMV_K}),
    hb AS (SELECT {h} AS h FROM ub ORDER BY h LIMIT {_KMV_K}),
    un AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
           ORDER BY h LIMIT {_KMV_K}),
    inboth AS (
      SELECT count(*) AS n_both,
             (SELECT count(*) FROM un)::DOUBLE AS n_sk,
             (SELECT max(h) FROM un) AS h_k
      FROM un
      WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
    ),
    exact AS (
      SELECT
        (SELECT count(*) FROM (SELECT user_id FROM ua
                               INTERSECT SELECT user_id FROM ub))::DOUBLE
          AS n_int,
        (SELECT count(*) FROM (SELECT user_id FROM ua
                               UNION SELECT user_id FROM ub))::DOUBLE
          AS n_un
    )
    SELECT {_KMV_K} AS k,
           round(b.n_both / b.n_sk, 6) AS est_jaccard,
           round(e.n_int / e.n_un, 6) AS exact_jaccard,
           round(abs(b.n_both / b.n_sk - e.n_int / e.n_un), 6)
             AS abs_err,
           round(CASE WHEN b.n_sk < {_KMV_K}
                      THEN b.n_sk
                      ELSE ({_KMV_K} - 1) * {_TWO60} / b.h_k END, 2)
             AS est_union_distinct,
           e.n_un::BIGINT AS exact_union_distinct
    FROM inboth b, exact e
    """


@register(
    "sk_kmv_jaccard",
    _kmv_oracle_sql(),
    f"KMV (k={_KMV_K} minimum values) set-similarity sketch: purchase "
    "users vs view users, each collapsed to its k smallest key hashes "
    "(TakeOrdered — per-partition heaps, k-row driver merge, the "
    "mergeable bottom-k that unions by 'merge lists, keep k "
    "smallest'). Jaccard estimates as the fraction of the combined "
    "bottom-k present in both sketches (Beyer et al. 2007), and the "
    "kth minimum yields the union-cardinality estimate (k-1)*2^60/"
    "h_(k) — the exact Jaccard and union rows ride along for the "
    "error column. A partially-filled sketch (union smaller than k) "
    "holds the WHOLE union, so the divisor is the sketch's real size "
    "and cardinality is exact — the k-divisor shortcut deflates small "
    "sets (caught at sf0.001 where only 15 users purchase). "
    "Deterministic md5 hashes make the sketch itself "
    "oracle-verifiable; the epsilon behavior is asserted as an "
    "invariant test, the values here are exact.",
)
def sk_kmv_jaccard(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    h = hash60(F.col("user_id").cast("string")).alias("h")

    def sketch(etype):
        return (
            ev.filter(F.col("event_type") == etype)
            .select("user_id")
            .distinct()
            .select(h)
            .orderBy("h")
            .limit(_KMV_K)
        )

    ha, hb = sketch("purchase"), sketch("view")
    un = (
        ha.union(hb).distinct().orderBy("h").limit(_KMV_K)
    )
    n_both = (
        un.join(ha, "h", "left_semi")
        .join(hb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    # a partially-filled sketch (|A ∪ B| < k) holds the WHOLE union:
    # the divisor is the sketch's real size, and cardinality is exact —
    # dividing by k there deflates the Jaccard estimate toward 0
    kth = un.agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("double").alias("n_sk"),
    )
    ua = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    ub = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    exact = (
        ua.join(ub, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("double").alias("n_int"))
        .crossJoin(
            ua.union(ub)
            .distinct()
            .agg(F.count(F.lit(1)).cast("double").alias("n_un"))
        )
    )
    est_j = F.col("n_both") / F.col("n_sk")
    est_card = F.when(
        F.col("n_sk") < _KMV_K, F.col("n_sk")
    ).otherwise(F.lit((_KMV_K - 1) * _TWO60) / F.col("h_k"))
    return (
        n_both.crossJoin(kth)
        .crossJoin(exact)
        .select(
            F.lit(_KMV_K).alias("k"),
            F.round(est_j, 6).alias("est_jaccard"),
            F.round(F.col("n_int") / F.col("n_un"), 6).alias(
                "exact_jaccard"
            ),
            F.round(
                F.abs(est_j - F.col("n_int") / F.col("n_un")), 6
            ).alias("abs_err"),
            F.round(est_card, 2).alias("est_union_distinct"),
            F.col("n_un").cast("long").alias("exact_union_distinct"),
        )
    )


# ===========================================================================
# DEDUP: LSH banding tuning report
# ===========================================================================

def _lsh_tuning_oracle_sql() -> str:
    from mcyj_datapipeline_spark.operators.hashing import (
        MINHASH_PERMS,
        MINHASH_PRIME,
    )

    h = hash60_sql("s")
    perm_exprs = ", ".join(
        f"list_min([({a}::BIGINT * x + {b}) % {MINHASH_PRIME} "
        f"for x in hs]) AS s{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    band_keys = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, s{b*4}::VARCHAR || '_' || "
        f"s{b*4+1}::VARCHAR || '_' || s{b*4+2}::VARCHAR || '_' || "
        f"s{b*4+3}::VARCHAR AS band_key FROM sigs"
        for b in range(4)
    )
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([{h} % {MINHASH_PRIME}
                            for s in list_distinct(
                              [array_to_string(w[i:i+2], ' ')
                               for i in range(1, len(w) - 1)])]) AS hs
      FROM words WHERE len(w) >= 3
    ), sigs AS (
      SELECT doc_id, {perm_exprs} FROM sh
    ), bands AS (
      {band_keys}
    ), buckets AS (
      SELECT band, band_key, count(*) AS sz
      FROM bands GROUP BY band, band_key
    )
    SELECT band,
           sum(sz)::BIGINT AS n_docs,
           count(*) AS n_buckets,
           max(sz) AS max_bucket,
           count(*) FILTER (sz = 1) AS singleton_buckets,
           (sum(sz * (sz - 1)) / 2)::BIGINT AS candidate_pairs
    FROM buckets GROUP BY band ORDER BY band
    """


@register(
    "dedup_lsh_tuning_report",
    _lsh_tuning_oracle_sql(),
    "LSH banding diagnostics for the MinHash dedup pipeline: per band, "
    "how many buckets formed, the largest bucket, the singleton share, "
    "and the candidate-pair bill sum(sz*(sz-1)/2) — exactly the "
    "numbers an operator reads before touching max_bucket_size or the "
    "band/row split on 100 TB (a band whose candidate count explodes "
    "is the skew valve's trigger; all-singleton bands mean the "
    "threshold is too tight to recall anything). Reuses the verified "
    "minhash_signatures/lsh_bands operators unchanged; the report "
    "itself is two bounded groupBys over the band relation the pair "
    "join already builds, so the diagnostics are free relative to the "
    "dedup run they tune.",
)
def dedup_lsh_tuning_report(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    bands = lsh_bands(minhash_signatures(docs))
    buckets = bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.sum("sz").alias("n_docs"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket"),
            F.count(F.when(F.col("sz") == 1, 1)).alias(
                "singleton_buckets"
            ),
            (F.sum(F.col("sz") * (F.col("sz") - 1)) / 2)
            .cast("long")
            .alias("candidate_pairs"),
        )
        .orderBy("band")
    )

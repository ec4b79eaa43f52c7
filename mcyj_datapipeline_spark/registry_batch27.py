"""Batch 27 registry entries (round 6, continued): per-dimension
embedding standardization statistics (the preprocessing fit every
vector pipeline runs before indexing/whitening) and the complete SQL
ranking-function family with tie semantics.

Reference provenance: none direct — the per-dim fit is the
`StandardScaler.fit` shape over an array column (one scan, d-grain
output); the ranking family rounds out SURVEY §2.5's window coverage
with the value-deterministic tie behavior (rank/dense_rank/
percent_rank/cume_dist depend on the ORDER value, ntile on row
order — so ntile gets a unique tie-break and the others share
buckets).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["v4_embedding_standardize", "w8_rank_family"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


@register(
    "v4_embedding_standardize",
    """
    SELECT dim, round(avg(v), 6) AS mean_v,
           round(stddev_pop(v), 6) AS std_v,
           round(min(v), 6) AS min_v,
           round(max(v), 6) AS max_v
    FROM (
      SELECT generate_subscripts(embedding, 1) AS dim,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    )
    GROUP BY dim ORDER BY dim
    """,
    "Per-dimension standardization fit over the embedding corpus "
    "(StandardScaler.fit for an array<float> column): mean / "
    "population-std / min / max per dimension in ONE scan — "
    "posexplode flattens each vector to (dim, value) rows that "
    "partial-aggregate map-side, so the shuffle carries 64 partial "
    "rows per partition, never the vectors. The d-grain result (64 "
    "rows) is what broadcasts back for the normalize APPLY step "
    "(asserted in tests: z-scoring with these stats yields mean 0 / "
    "var 1 per dim). At 100 TB this is the canonical fit/apply "
    "split: fit is one cheap pass, apply is map-only with the stats "
    "broadcast.",
)
def v4_embedding_standardize(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("embedding")
    flat = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double"))
    return (
        flat.groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.stddev_pop("v"), 6).alias("std_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
        .orderBy("dim")
    )


@register(
    "w8_rank_family",
    """
    WITH b AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             floor(o_totalprice / 10000)::BIGINT AS price_bucket
      FROM orders
    )
    SELECT priority, o_orderkey, price_bucket,
           rank, dense_rank,
           round(percent_rank, 6) AS percent_rank,
           round(cume_dist, 6) AS cume_dist,
           ntile4
    FROM (
      SELECT priority, o_orderkey, price_bucket,
             rank() OVER w AS rank,
             dense_rank() OVER w AS dense_rank,
             percent_rank() OVER w AS percent_rank,
             cume_dist() OVER w AS cume_dist,
             ntile(4) OVER (PARTITION BY priority
                            ORDER BY price_bucket DESC, o_orderkey) AS ntile4
      FROM b
      WINDOW w AS (PARTITION BY priority ORDER BY price_bucket DESC)
    ) WHERE dense_rank <= 2
    ORDER BY priority, price_bucket DESC, o_orderkey
    """,
    "The complete SQL ranking family in one query, with ties on "
    "purpose (prices bucketed to 10k so many rows share a rank): "
    "rank / dense_rank / percent_rank / cume_dist are functions of "
    "the ORDER VALUE — tied rows share results, so an order-by "
    "without a unique key is still deterministic — while ntile "
    "depends on ROW order and therefore gets the unique "
    "(bucket, orderkey) tie-break; mixing those two tie regimes "
    "correctly is exactly what this query pins cross-engine. All "
    "windows are partitioned by priority (SURVEY §2.5's grouping), "
    "output cut to the top-2 dense-rank buckets per priority — a "
    "value-deterministic row set even with ties.",
)
def w8_rank_family(spark, sf_dir):
    b = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 10000).alias("price_bucket"),
    )
    w = Window.partitionBy("priority").orderBy(F.desc("price_bucket"))
    wn = Window.partitionBy("priority").orderBy(
        F.desc("price_bucket"), "o_orderkey"
    )
    return (
        b.select(
            "priority",
            "o_orderkey",
            "price_bucket",
            F.rank().over(w).alias("rank"),
            F.dense_rank().over(w).alias("dense_rank"),
            F.round(F.percent_rank().over(w), 6).alias("percent_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
            F.ntile(4).over(wn).alias("ntile4"),
        )
        .filter(F.col("dense_rank") <= 2)
        .orderBy("priority", F.desc("price_bucket"), "o_orderkey")
    )

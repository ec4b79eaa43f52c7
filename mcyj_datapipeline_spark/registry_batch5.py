"""Batch 5 registry entries (round 2): mergeable-sketch rollups,
embedding-space decontamination, and a six-table SQL-entry join —
each a 100 TB-first pattern with a full DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Mergeable HLL sketch rollup (Apache DataSketches, built into Spark 4)
# ===========================================================================

@register(
    "sk_hll_daily_uniques_rollup",
    """
    WITH daily AS (
      SELECT ts::DATE AS day, count(DISTINCT user_id) AS daily_uniques
      FROM events GROUP BY 1
    ),
    total AS (SELECT count(DISTINCT user_id) AS total_uniques FROM events)
    SELECT day, daily_uniques, total_uniques
    FROM daily CROSS JOIN total
    ORDER BY day
    """,
    "Mergeable-sketch rollup: per-day HLL sketches of user_id, merged "
    "to a corpus total with hll_union_agg — the 100 TB pattern where "
    "daily sketch rows (KB each) are stored and any date-range "
    "cardinality is a sketch union, never a re-scan of raw events. "
    "Value oracle vs exact count(DISTINCT): HLL lgK=12 runs in sparse "
    "mode at gate cardinality, where estimates are exact.",
)
def sk_hll_daily_uniques_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # total = union of the DAILY sketches (not a second scan of events):
    # this is the merge the pattern exists for.
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("total_uniques")
    )
    return (
        daily.select(
            "day", F.hll_sketch_estimate("sk").alias("daily_uniques")
        )
        .join(F.broadcast(total))
        .orderBy("day")
    )


# ===========================================================================
# Embedding-space benchmark decontamination
# ===========================================================================

# Real corpora run tau≈0.95; the synthetic embeddings are near-orthogonal
# random vectors (p99 pairwise cosine ≈ 0.29), so tau sits just above the
# p99 to exercise the flag-and-argmax path with a non-empty result.
_DECON_TAU = 0.25
_COS_CB = (
    "list_sum([cv[i]::DOUBLE * bv[i]::DOUBLE for i in range(1, len(cv) + 1)]) / "
    "(sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE for i in range(1, len(cv) + 1)])) * "
    "sqrt(list_sum([bv[i]::DOUBLE * bv[i]::DOUBLE for i in range(1, len(bv) + 1)])))"
)


@register(
    "decon_embedding_contamination",
    f"""
    WITH bench AS (
      SELECT vec_id AS bench_id, embedding AS bv FROM embeddings WHERE vec_id < 8
    ),
    corpus AS (
      SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id >= 8
    ),
    scored AS (
      SELECT c.vec_id, b.bench_id, round({_COS_CB}, 6) AS cosine
      FROM corpus c CROSS JOIN bench b
    ),
    best AS (
      SELECT vec_id, bench_id, cosine,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cosine DESC, bench_id DESC
             ) AS rn
      FROM scored
    )
    SELECT vec_id, bench_id, cosine FROM best
    WHERE rn = 1 AND cosine >= {_DECON_TAU}
    """,
    "Embedding-space benchmark decontamination: corpus vectors whose "
    "cosine to any benchmark vector reaches tau (paraphrase leaks the "
    "n-gram collision test misses). Benchmark side broadcasts — the "
    "corpus never shuffles; argmax via max(struct) keeps one agg.",
)
def decon_embedding_contamination(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import (
        embedding_contamination,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_contamination(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        tau=_DECON_TAU,
    )


# ===========================================================================
# SQL entry: six-table join (TPC-H Q5 shape)
# ===========================================================================

_SQL5 = """
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM {c}, {o}, {l}, {s}, {n}, {r}
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY n_name
    ORDER BY revenue DESC, nation
"""


@register(
    "sql5_local_supplier_volume",
    _SQL5.format(c="customer", o="orders", l="lineitem", s="supplier",
                 n="nation", r="region"),
    "SQL entry, TPC-H Q5 shape: six-table join with the "
    "customer-supplier same-nation correlation — exercises Catalyst "
    "join reordering and AQE broadcast of the dim chain "
    "(region->nation) while the two fact joins stay shuffle-hash; "
    "reference parity: the website build's deepest join tree "
    "(generate_website_data.py) never exceeds five inputs, so this is "
    "the SQL-surface stress case beyond it.",
)
def sql5_local_supplier_volume(spark, sf_dir):
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"sql5_{t}")
    return spark.sql(
        _SQL5.format(c="sql5_customer", o="sql5_orders", l="sql5_lineitem",
                     s="sql5_supplier", n="sql5_nation", r="sql5_region")
    )

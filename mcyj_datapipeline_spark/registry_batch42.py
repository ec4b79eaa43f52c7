"""Batch 42 registry entries (round 6, continued): similarity-graph
matching and sketch set-algebra —

- ``sim_mutual_knn``: mutual top-k nearest-neighbor pairs — the
  reciprocal-matching primitive behind bitext mining and
  duplicate-entity matching (a one-directional neighbor is often a
  hub artifact; mutuality is the cheap symmetry filter that kills
  hub false-positives).
- ``sk_hll_audience_overlap``: set INTERSECTION estimated by HLL
  inclusion-exclusion (|A∩B| = |A| + |B| - |A∪B| on sketch
  estimates) — the audience-overlap question answered from three
  KB-sized sketches instead of a distinct-join over raw events,
  gated by an in-plan error contract against the exact intersection.

Reference provenance: none direct — beyond-reference curation ops
per the SURVEY.md mandate (Artetxe & Schwenk 2019 for margin/mutual
kNN bitext mining).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import similarity as S
from mcyj_datapipeline_spark.registry import register

__all__ = ["sim_mutual_knn", "sk_hll_audience_overlap"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Mutual top-k nearest neighbors within a cohort
# ===========================================================================

_MKNN_K = 5
_MKNN_COHORT = 256  # vec_id < 256 — bounded cohort, exact at test scale


@register(
    "sim_mutual_knn",
    f"""
    WITH cohort AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_MKNN_COHORT}
    ), scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             round(
               list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                         for i in range(1, len(a.embedding) + 1)]) /
               (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                               for i in range(1, len(a.embedding) + 1)])) *
                sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                               for i in range(1, len(b.embedding) + 1)]))),
             6) AS cosine
      FROM cohort a CROSS JOIN cohort b WHERE a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT qid, nid, cosine,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, nid) AS rnk
      FROM scored
    ), topk AS (
      SELECT qid, nid, cosine, rnk FROM ranked WHERE rnk <= {_MKNN_K}
    )
    SELECT f.qid AS id_a, f.nid AS id_b, f.cosine,
           f.rnk AS rank_ab, r.rnk AS rank_ba
    FROM topk f JOIN topk r ON r.qid = f.nid AND r.nid = f.qid
    WHERE f.qid < f.nid
    ORDER BY id_a, id_b
    """,
    f"Mutual top-{_MKNN_K} nearest-neighbor pairs within a bounded "
    f"cohort (vec_id < {_MKNN_COHORT}): a pair survives only if each "
    "side ranks in the OTHER's top-k — the reciprocity filter bitext "
    "mining and entity matching use to kill hub false-positives "
    "(a hub vector is near everyone; almost no one is mutually near "
    "it). Plan: one scored relation, per-side row_number top-k, then "
    "a self-join of the tiny top-k relation on the reversed pair — "
    "the quadratic stage is the labeled test-scale baseline; at "
    "100 TB the SAME plan runs with the candidate generator swapped "
    "to LSH/IVF buckets (the sim_embedding_near_dup shape), since "
    "mutuality only ever inspects the top-k relation, never "
    "all-pairs.",
)
def sim_mutual_knn(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _MKNN_COHORT
    )
    a = S._spread(emb, "vec_id").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    b = F.broadcast(
        emb.select(
            F.col("vec_id").alias("nid"), F.col("embedding").alias("nv")
        )
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(S.cosine(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("nid"))
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MKNN_K)
        .localCheckpoint(eager=False)
    )
    rev = topk.select(
        F.col("qid").alias("r_qid"),
        F.col("nid").alias("r_nid"),
        F.col("rnk").alias("rank_ba"),
    )
    return (
        topk.join(
            rev,
            (F.col("r_qid") == F.col("nid"))
            & (F.col("r_nid") == F.col("qid")),
        )
        .filter(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("id_a"),
            F.col("nid").alias("id_b"),
            "cosine",
            F.col("rnk").alias("rank_ab"),
            "rank_ba",
        )
        .orderBy("id_a", "id_b")
    )


# ===========================================================================
# HLL set algebra: audience overlap by inclusion-exclusion
# ===========================================================================

_OVL_LGK = 12
_OVL_EPS = 0.05


@register(
    "sk_hll_audience_overlap",
    """
    WITH a AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT (SELECT count(*) FROM a) AS n_a_exact,
           (SELECT count(*) FROM b) AS n_b_exact,
           (SELECT count(*) FROM a JOIN b USING (user_id))
             AS n_overlap_exact,
           true AS within_bound
    """,
    "Sketch set-algebra: the click-audience / purchase-audience "
    "overlap estimated by HLL inclusion-exclusion — |A∩B| = |A| + "
    "|B| - |A∪B| over three sketch estimates, where the union sketch "
    "is hll_union of the two per-audience sketches. At 100 TB each "
    "audience aggregates once into a KB blob and EVERY pairwise "
    "overlap question after that is sketch math — no distinct-join "
    "re-scan per question. The in-plan contract bounds the estimate "
    "within 5% of (|A|+|B|) of the exact intersection (errors of "
    "three estimates compound; rse at lgK=12 is ~1.6% each), and "
    "the oracle carries the exact counts so the hash fails if the "
    "sketch algebra ever degrades.",
)
def sk_hll_audience_overlap(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    sk = (
        a.agg(F.hll_sketch_agg("user_id", F.lit(_OVL_LGK)).alias("ska"))
        .crossJoin(
            b.agg(
                F.hll_sketch_agg("user_id", F.lit(_OVL_LGK)).alias("skb")
            )
        )
    )
    est = sk.select(
        F.hll_sketch_estimate("ska").alias("ea"),
        F.hll_sketch_estimate("skb").alias("eb"),
        F.hll_sketch_estimate(F.hll_union("ska", "skb")).alias("eu"),
    )
    exact = (
        a.select("user_id")
        .distinct()
        .join(b.select("user_id").distinct(), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_overlap_exact"))
        .crossJoin(
            a.select("user_id").distinct().agg(
                F.count(F.lit(1)).alias("n_a_exact")
            )
        )
        .crossJoin(
            b.select("user_id").distinct().agg(
                F.count(F.lit(1)).alias("n_b_exact")
            )
        )
    )
    est_overlap = F.col("ea") + F.col("eb") - F.col("eu")
    within = (
        F.abs(est_overlap - F.col("n_overlap_exact"))
        <= F.lit(_OVL_EPS) * (F.col("n_a_exact") + F.col("n_b_exact"))
        + F.lit(2.0)
    )
    return est.crossJoin(exact).select(
        "n_a_exact",
        "n_b_exact",
        "n_overlap_exact",
        within.alias("within_bound"),
    )

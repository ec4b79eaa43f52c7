"""Batch 26 registry entries (round 6, continued): truncated-dimension
retrieval recall (the Matryoshka-embedding question) and a
referential-integrity audit across every foreign key in the star
schema.

Reference provenance: none direct — the truncation-recall report is
the evaluation every modern embedding deployment runs before cutting
storage 4x (Kusupati et al. 2022, Matryoshka Representation Learning,
public); the FK audit is the dq-family completeness check the
reference's hand-maintained CSVs silently assume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import similarity as S
from mcyj_datapipeline_spark.registry import register

__all__ = ["sim_truncated_dim_recall", "dq5_referential_integrity"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_TRUNC_DIM = 16
_RECALL_K = 5


def _topk_sql(dim_expr: str, alias: str) -> str:
    return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(
                   list_sum([qv[i]::DOUBLE * cv[i]::DOUBLE
                             for i in range(1, {dim_expr} + 1)]) /
                   (sqrt(list_sum([qv[i]::DOUBLE * qv[i]::DOUBLE
                                   for i in range(1, {dim_expr} + 1)])) *
                    sqrt(list_sum([cv[i]::DOUBLE * cv[i]::DOUBLE
                                   for i in range(1, {dim_expr} + 1)]))), 6
                 ) DESC, c.neighbor_id
               ) AS rnk
        FROM (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 8) q
        CROSS JOIN (SELECT vec_id AS neighbor_id, embedding AS cv
                    FROM embeddings) c
        WHERE c.neighbor_id <> q.query_id
      ) WHERE rnk <= {_RECALL_K}
    """


@register(
    "sim_truncated_dim_recall",
    f"""
    WITH full_k AS ({_topk_sql("len(qv)", "full")}),
    trunc_k AS ({_topk_sql(str(_TRUNC_DIM), "trunc")}),
    hits AS (
      SELECT f.query_id, count(t.neighbor_id) AS n_overlap
      FROM full_k f LEFT JOIN trunc_k t
        ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
      GROUP BY f.query_id
    ), m AS (
      SELECT round(avg(n_overlap / {_RECALL_K}.0), 6) AS mean_recall
      FROM hits
    )
    SELECT query_id, n_overlap,
           round(n_overlap / {_RECALL_K}.0, 6) AS recall,
           mean_recall
    FROM hits CROSS JOIN m ORDER BY query_id
    """,
    f"Matryoshka truncation evaluation: top-{_RECALL_K} retrieval "
    f"recall when cosine runs on only the first {_TRUNC_DIM} of 64 "
    "dimensions — the measurement that decides whether embeddings can "
    "ship at a quarter of the storage/bandwidth (MRL, Kusupati et al. "
    "2022). Both rankings come from the same brute-force operator "
    "(similarity.py cosine_topk), the truncated side simply sliced "
    "before scoring; the overlap join and the mean ride on the "
    "8-query-grain relations. At 100 TB this is the recurring eval "
    "job against a fixed query panel — the corpus scan is the only "
    "data-sized term and the truncated variant reads 4x fewer bytes "
    "when the store is dimension-sliced (the actual MRL deployment "
    "win).",
)
def sim_truncated_dim_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    full_k = S.cosine_topk(emb, queries, k=_RECALL_K).select(
        "query_id", "neighbor_id"
    )
    trunc = emb.withColumn("embedding", F.slice("embedding", 1, _TRUNC_DIM))
    trunc_q = queries.withColumn(
        "embedding", F.slice("embedding", 1, _TRUNC_DIM)
    )
    trunc_k = S.cosine_topk(trunc, trunc_q, k=_RECALL_K).select(
        F.col("query_id").alias("t_query"), F.col("neighbor_id").alias("t_nb")
    )
    hits = (
        full_k.join(
            trunc_k,
            (full_k["query_id"] == trunc_k["t_query"])
            & (full_k["neighbor_id"] == trunc_k["t_nb"]),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("t_nb").alias("n_overlap"))
    )
    mean = hits.agg(
        F.round(F.avg(F.col("n_overlap") / _RECALL_K), 6).alias("mean_recall")
    )
    return (
        hits.crossJoin(F.broadcast(mean))
        .select(
            "query_id",
            "n_overlap",
            F.round(F.col("n_overlap") / _RECALL_K, 6).alias("recall"),
            "mean_recall",
        )
        .orderBy("query_id")
    )


_FKS = [
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
]


def _fk_sql() -> str:
    parts = [
        f"""
        SELECT '{name}' AS relationship,
               (SELECT count(*) FROM {child}) AS n_child,
               (SELECT count(*) FROM {child}
                WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent})) AS n_orphan
        """
        for name, child, ckey, parent, pkey in _FKS
    ]
    return " UNION ALL ".join(parts)


@register(
    "dq5_referential_integrity",
    f"""
    SELECT relationship, n_child, n_orphan,
           round(n_orphan::DOUBLE / n_child, 6) AS orphan_share
    FROM ({_fk_sql()}) ORDER BY relationship
    """,
    "Referential-integrity audit: every foreign key of the star "
    "schema checked for orphans (child keys with no parent row) in "
    "one report — the dq-family completeness check that catches "
    "broken ingests (a dimension loaded after its facts, a truncated "
    "parent file) before a join silently drops rows. Each "
    "relationship is one LEFT ANTI join counting misses: at 100 TB "
    "the anti join shuffles only the key columns, and with both "
    "sides bucketed on the key it is shuffle-free; the report is "
    "4 rows regardless of scale.",
)
def dq5_referential_integrity(spark, sf_dir):
    out = None
    for name, child, ckey, parent, pkey in _FKS:
        c = _t(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pkey).alias("k"))
        n_child = c.agg(F.count(F.lit(1)).alias("n_child"))
        n_orphan = c.join(p, "k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan")
        )
        row = (
            n_child.crossJoin(n_orphan)
            .select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphan",
                F.round(F.col("n_orphan") / F.col("n_child"), 6).alias(
                    "orphan_share"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")

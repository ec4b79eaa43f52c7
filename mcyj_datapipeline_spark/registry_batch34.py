"""Batch 34 registry entries (round 6, continued): graph locality and
privacy-release completions —

- ``g6_clustering_coefficient``: per-node local clustering
  coefficient (triangles over wedge capacity) — the node-grain dual
  of the global triangle census ``g2``.
- ``dp_noisy_counts``: differentially-private count release with
  SEEDED Laplace noise — the noise is derived from the shared
  60-bit md5 hash of the group key (inverse-CDF transform), so the
  mechanism is deterministic, fully value-oracled, and every
  statistical property of real DP noise except unpredictability is
  preserved (a production run swaps the hash for a CSPRNG draw and
  NOTHING else changes).
- ``dq8_l_diversity``: l-diversity audit of the k-anonymity
  equivalence classes — k bounds re-identification, l bounds
  attribute disclosure (a class of 50 identical priorities is
  k-anonymous and still leaks everyone's priority).

Reference provenance: none direct — beyond-reference governance ops
per the SURVEY.md mandate (Dwork 2006 for the Laplace mechanism,
Machanavajjhala 2007 for l-diversity, Watts-Strogatz for cc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60, hash60_sql
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "g6_clustering_coefficient",
    "dp_noisy_counts",
    "dq8_l_diversity",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


from mcyj_datapipeline_spark.functions.numerics import stable6 as _stable  # noqa: E402


# ===========================================================================
# G6: per-node clustering coefficient (same graph as the g2 census)
# ===========================================================================


@register(
    "g6_clustering_coefficient",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_quantity >= 25
    ), co AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM op l1 JOIN op l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ), deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM co UNION ALL SELECT b FROM co
      ) GROUP BY node
    ), oriented AS (
      SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
             CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v
      FROM co JOIN deg da ON da.node = a JOIN deg db ON db.node = b
    ), tri AS (
      SELECT o1.u AS u, o1.v AS x, o2.v AS y
      FROM oriented o1
      JOIN oriented o2 ON o1.u = o2.u AND o1.v < o2.v
      JOIN co ON co.a = o1.v AND co.b = o2.v
    ), tn AS (
      SELECT node, count(*) AS t FROM (
        SELECT u AS node FROM tri
        UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri
      ) GROUP BY node
    )
    SELECT d.node, d.d AS degree,
           coalesce(tn.t, 0) AS triangles,
           CASE WHEN d.d >= 2 THEN
             floor(((2.0 * coalesce(tn.t, 0)) / (d.d * (d.d - 1)))
                   * 1000000.0 + 0.5) / 1000000.0
           ELSE 0.0 END AS cc
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    ORDER BY d.node
    """,
    "Per-node local clustering coefficient of the part co-purchase "
    "graph (the g2 census graph at node grain): cc(v) = 2*T(v) / "
    "(d(v)*(d(v)-1)) — the local-density signal behind community and "
    "spam-graph screening. Same degree-ordered orientation as the "
    "census (every node's out-degree O(sqrt(m)), wedge shuffle "
    "O(m^1.5)), but the wedge-closing join keeps all three triangle "
    "vertices, and one unpivot+groupBy yields exact per-node triangle "
    "counts. Node-grain output; nothing pair-grain leaves the "
    "shuffle.",
)
def g6_clustering_coefficient(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import (
        clustering_coefficients,
    )
    from mcyj_datapipeline_spark.registry_batch11 import copurchase_edges

    return clustering_coefficients(copurchase_edges(spark, sf_dir))


# ===========================================================================
# Differentially-private count release (seeded Laplace mechanism)
# ===========================================================================

_DP_EPSILON = 1.0  # sensitivity 1 (unit counts) -> scale b = 1/epsilon
_DP_SEED_PREFIX = "dp-noise-v1:"
_TWO_POW_60 = float(1 << 60)


@register(
    "dp_noisy_counts",
    f"""
    WITH g AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), u AS (
      SELECT source, n,
             {hash60_sql(f"'{_DP_SEED_PREFIX}' || source")}::DOUBLE
               / {_TWO_POW_60!r} AS u01
      FROM g
    )
    SELECT source, {_DP_EPSILON} AS epsilon,
           floor((n + (-(1.0 / {_DP_EPSILON}) * sign(u01 - 0.5)
                       * ln(greatest(1.0 - 2.0 * abs(u01 - 0.5), 1e-18))))
                 * 1000000.0 + 0.5) / 1000000.0 AS noisy_count
    FROM u ORDER BY source
    """,
    "Differentially-private per-source document counts via the "
    "Laplace mechanism (sensitivity 1, epsilon 1): noise is the "
    "inverse-CDF transform -b*sign(p)*ln(1-2|p|) of a uniform draw — "
    "here SEEDED from the shared 60-bit md5 hash of the group key, "
    "which makes the release deterministic and fully value-oracled "
    "while keeping the exact Laplace shape (swap the hash for a "
    "CSPRNG draw in production and nothing else changes; secrecy, "
    "not shape, is what the seed forfeits). One map-side count "
    "aggregate + O(groups) scalar math — the true counts never "
    "leave the engine.",
)
def dp_noisy_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    u01 = (
        hash60(F.concat(F.lit(_DP_SEED_PREFIX), F.col("source"))).cast(
            "double"
        )
        / F.lit(_TWO_POW_60)
    )
    p = u01 - F.lit(0.5)
    noise = (
        -(F.lit(1.0) / F.lit(_DP_EPSILON))
        * F.signum(p)
        * F.log(
            F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(p), F.lit(1e-18))
        )
    )
    return g.select(
        "source",
        F.lit(_DP_EPSILON).alias("epsilon"),
        _stable(F.col("n") + noise).alias("noisy_count"),
    ).orderBy("source")


# ===========================================================================
# l-diversity audit over the k-anonymity equivalence classes
# ===========================================================================

_LDIV_L = 3  # each class must carry >= 3 distinct sensitive values


@register(
    "dq8_l_diversity",
    f"""
    SELECT o_orderstatus AS status,
           strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n,
           count(DISTINCT o_orderpriority) AS n_sensitive,
           (count(DISTINCT o_orderpriority) >= {_LDIV_L}) AS diverse_ok
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "l-diversity audit of the (status, month) quasi-identifier "
    "classes with o_orderpriority as the sensitive attribute: a "
    f"class passes only when it carries >= {_LDIV_L} DISTINCT "
    "sensitive values — the disclosure check k-anonymity (dq4) "
    "cannot make, since a large class of identical priorities is "
    "perfectly k-anonymous and still leaks every member's value. "
    "One groupBy with a distinct-count; at 100 TB the class grain "
    "is small and the distinct-count partial-aggregates map-side.",
)
def dq8_l_diversity(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_orderpriority").alias("n_sensitive"),
        )
        .select(
            "status",
            "month",
            "n",
            "n_sensitive",
            (F.col("n_sensitive") >= _LDIV_L).alias("diverse_ok"),
        )
        .orderBy("status", "month")
    )

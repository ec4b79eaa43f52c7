"""Batch 19 registry entries (round 6, continued): k-hop BFS
reachability — the frontier-expansion iterative pattern that completes
the graph family (g1 mass propagation, g2 census, g3 vote
propagation, dedup CC pointer-jumping; this adds visited-set BFS).

Reference provenance: none direct — the reference has no graph
engine; this is the "what can N hops of the purchase network reach"
question an analyst asks of the same orders/lineitem data, as a
declarative iterative DataFrame plan with an unrolled-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

_SEED_MAX_CUSTKEY = 5  # seeds: customers 0..4 (packed ids 0,2,4,6,8)
_HOPS = 3

_G4_ROUND = """
    f{r} AS (
      SELECT DISTINCT e.dst AS node
      FROM edges e JOIN f{p} f ON f.node = e.src
      WHERE e.dst NOT IN (SELECT node FROM v{p})
    ),
    v{r} AS (SELECT node FROM v{p} UNION SELECT node FROM f{r}),
    h{r} AS (SELECT node, {r} AS hop FROM f{r})"""


@register(
    "g4_khop_reachability",
    f"""
    WITH base AS (
      SELECT DISTINCT o.o_custkey * 2 AS cn, l.l_suppkey * 2 + 1 AS sn
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT cn AS src, sn AS dst FROM base
      UNION ALL SELECT sn, cn FROM base
    ),
    f0 AS (SELECT DISTINCT src AS node FROM edges
           WHERE src % 2 = 0 AND src < {2 * _SEED_MAX_CUSTKEY}),
    v0 AS (SELECT node FROM f0),
    {_G4_ROUND.format(r=1, p=0)},
    {_G4_ROUND.format(r=2, p=1)},
    {_G4_ROUND.format(r=3, p=2)}
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || (node >> 1)::VARCHAR
                ELSE 's' || (node >> 1)::VARCHAR END AS node, hop
    FROM (SELECT node, 0 AS hop FROM f0
          UNION ALL SELECT node, hop FROM h1
          UNION ALL SELECT node, hop FROM h2
          UNION ALL SELECT node, hop FROM h3)
    ORDER BY hop, node
    """,
    f"BFS k-hop reachability (k={_HOPS}) from the seed customers "
    f"(custkey < {_SEED_MAX_CUSTKEY}) over the mirrored purchase "
    "graph, labeling every reached node with its MINIMUM hop distance "
    "— frontier expansion with a visited-set anti-join, the iterative "
    "pattern CC/LPA/PageRank don't cover. Spark plan: per hop, one "
    "hash join of the (small) frontier against the src-partitioned "
    "cached edges, a distinct, and a left_anti against the visited "
    "set; the frontier is what shuffles, never the full graph, and "
    "BFS guarantees first-visit = shortest-hop so no min-aggregation "
    "pass is needed. Visited state is one row per reached node, "
    "localCheckpointed per hop (constant plan). The oracle unrolls "
    "the same rounds with NOT IN visited sets. Computed on packed "
    "long ids, rendered 'c…'/'s…' at output.",
)
def g4_khop_reachability(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cn"),
            (F.col("l_suppkey") * 2 + 1).alias("sn"),
        )
        .distinct()
    )
    edges = (
        base.select(F.col("cn").alias("src"), F.col("sn").alias("dst"))
        .union(base.select(F.col("sn"), F.col("cn")))
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    frontier = (
        edges.filter(
            (F.col("src") % 2 == 0)
            & (F.col("src") < 2 * _SEED_MAX_CUSTKEY)
        )
        .select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier
    out = frontier.select("node", F.lit(0).alias("hop"))
    for hop in range(1, _HOPS + 1):
        frontier = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.union(frontier).localCheckpoint(eager=False)
        out = out.union(frontier.select("node", F.lit(hop).alias("hop")))
    node_str = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), F.shiftright("node", 1)),
    ).otherwise(F.concat(F.lit("s"), F.shiftright("node", 1)))
    return out.select(node_str.alias("node"), "hop").orderBy("hop", "node")

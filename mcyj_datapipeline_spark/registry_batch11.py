"""Batch 11 registry entries (round 3, continued): graph analytics
(PageRank, triangle census), sorted-neighborhood dedup blocking, and a
recursive-CTE oracle upgrade for the previously rows-only chained
throttle.

Reference provenance: the reference repo's graph-adjacent surface is
the trie/prefix index (``build_trie.py``) and duplicate-pair grouping;
these extend the engine the way the dedup/similarity families do —
the interaction-graph analyses (who is central, how clustered) that a
pipeline over the same purchase/event data would ask next, each
re-expressed as shuffle-join DataFrame programs with DuckDB value
oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register, set_oracle


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# G1: PageRank over the customer<->supplier purchase graph
# ===========================================================================

@register(
    "g1_pagerank_purchase_graph",
    """
    WITH base AS (
      SELECT DISTINCT 'c' || o.o_custkey AS cn, 's' || l.l_suppkey AS sn
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT cn AS src, sn AS dst FROM base
      UNION ALL SELECT sn, cn FROM base
    ), nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT src, count(*)::DOUBLE AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes),
    r1 AS (
      SELECT nd.node,
             (SELECT 0.15/n FROM nn) + 0.85 * coalesce(m.mass, 0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.d) AS mass
        FROM edges e JOIN r0 r ON r.node = e.src
                     JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst
      ) m ON m.dst = nd.node
    ), r2 AS (
      SELECT nd.node,
             (SELECT 0.15/n FROM nn) + 0.85 * coalesce(m.mass, 0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.d) AS mass
        FROM edges e JOIN r1 r ON r.node = e.src
                     JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst
      ) m ON m.dst = nd.node
    ), r3 AS (
      SELECT nd.node,
             (SELECT 0.15/n FROM nn) + 0.85 * coalesce(m.mass, 0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.d) AS mass
        FROM edges e JOIN r2 r ON r.node = e.src
                     JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst
      ) m ON m.dst = nd.node
    )
    SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node
    """,
    "Three-iteration PageRank over the undirected bipartite customer<->"
    "supplier purchase graph (edges mirrored so the walk is stochastic "
    "— no dangling mass). Spark plan: out-degrees pre-join into a "
    "weighted edge list ONCE (repartitioned on src, persisted); each "
    "iteration is exactly one hash join of the previous round's ranks "
    "(already hash-partitioned on node by its groupBy) against the "
    "cached edges plus one groupBy(dst) — iterations x one shuffle, "
    "constant plan size via localCheckpoint. The oracle unrolls the "
    "same three rounds as chained CTEs. Ranks rounded to 6dp (sum "
    "order across engines differs at ~1e-16).",
)
def g1_pagerank_purchase_graph(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Compute on packed LONG node ids (customer 2k, supplier 2k+1):
    # every shuffle/join in the iteration moves 8-byte keys instead of
    # strings; the display form ('c123'/'s45') is reconstructed only
    # in the final projection, where the oracle's string sort applies.
    base = (
        orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("cn"),
            (F.col("l_suppkey") * 2 + 1).alias("sn"),
        )
        .distinct()
    )
    edges = base.select(
        F.col("cn").alias("src"), F.col("sn").alias("dst")
    ).union(base.select(F.col("sn"), F.col("cn")))
    ranks = pagerank(edges, iterations=3, damping=0.85)
    # Decode with integer bit-shift, not `/ 2` (double division loses
    # precision above 2^53, which would corrupt ids at real scale —
    # for both parities, n >> 1 is exactly the unpacked id).
    node_str = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("c"), F.shiftright("node", 1))
    ).otherwise(
        F.concat(F.lit("s"), F.shiftright("node", 1))
    )
    return ranks.select(
        node_str.alias("node"), F.round("rank", 6).alias("rank")
    ).orderBy("node")


def copurchase_edges(spark, sf_dir):
    """Canonical part co-purchase edge list (parts sharing an order,
    bulk lines only; each edge once, a < b) — the ONE construction the
    whole graph family (g2 census, g6 clustering, g7 k-core) analyzes.
    Shared so a threshold change cannot silently fork the graph.
    NOT distinct()-ed here: every graph operator canonicalizes its
    input itself (triangle_stats/_canonical_oriented/kcore_nodes), so
    a caller-side distinct would just add a redundant shuffle."""
    op = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l1 = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a")
    )
    l2 = op.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b")
    )
    return l1.join(l2, "k").filter(F.col("a") < F.col("b")).select("a", "b")


# ===========================================================================
# G2: triangle census over the part co-purchase graph
# ===========================================================================

@register(
    "g2_triangle_census",
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
    ), wedges AS (
      SELECT o1.v AS x, o2.v AS y
      FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u AND o1.v < o2.v
    )
    SELECT (SELECT count(*) FROM co) AS n_edges,
           (SELECT count(*) FROM wedges) AS n_wedges,
           count(*) AS n_triangles
    FROM wedges w JOIN co ON co.a = w.x AND co.b = w.y
    """,
    "Triangle census of the part co-purchase graph (parts sharing an "
    "order, bulk lines only): degree-ordered orientation (Suri & "
    "Vassilvitskii) bounds every node's out-degree by O(sqrt(m)), so "
    "the wedge self-join shuffles O(m^1.5) worst-case instead of "
    "sum-of-squared-degrees — the hub part that would explode a naive "
    "wedge join contributes only its low-degree-endpoint wedges. All "
    "joins are node/edge-keyed hash joins; the single output row is "
    "the only driver traffic.",
)

def g2_triangle_census(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import triangle_stats

    return triangle_stats(copurchase_edges(spark, sf_dir))


# ===========================================================================
# Sorted-neighborhood dedup blocking (SNM)
# ===========================================================================

@register(
    "dedup_sorted_neighborhood",
    """
    WITH norm AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS sk
      FROM documents
    ), lagd AS (
      SELECT doc_id, lang, sk,
             lag(doc_id, 1) OVER w AS d1, lag(sk, 1) OVER w AS s1,
             lag(doc_id, 2) OVER w AS d2, lag(sk, 2) OVER w AS s2,
             lag(doc_id, 3) OVER w AS d3, lag(sk, 3) OVER w AS s3
      FROM norm
      WINDOW w AS (PARTITION BY lang, substr(sk, 1, 1)
                   ORDER BY sk, doc_id)
    ), pairs AS (
      SELECT lang, d1 AS id_a, doc_id AS id_b, s1 AS sk_a, sk AS sk_b
      FROM lagd WHERE d1 IS NOT NULL
      UNION ALL
      SELECT lang, d2, doc_id, s2, sk FROM lagd WHERE d2 IS NOT NULL
      UNION ALL
      SELECT lang, d3, doc_id, s3, sk FROM lagd WHERE d3 IS NOT NULL
    )
    SELECT id_a, id_b, lang AS block,
           round(least(length(sk_a), length(sk_b))::DOUBLE
                 / greatest(length(sk_a), length(sk_b)), 4) AS len_ratio
    FROM pairs
    WHERE substr(sk_a, 1, 12) = substr(sk_b, 1, 12)
      AND greatest(length(sk_a), length(sk_b)) > 0
      AND least(length(sk_a), length(sk_b))::DOUBLE
          / greatest(length(sk_a), length(sk_b)) >= 0.8
    ORDER BY id_a, id_b
    """,
    "Sorted-Neighborhood Method candidate pairs: normalize text to a "
    "sort key, order within (lang x leading char) blocks, compare each "
    "row to its 3 predecessors via window lags — O(n·w) instead of "
    "O(n^2), the classic record-linkage blocking. Entirely JVM-side "
    "(regex normalize, partitioned window, prefix/length filters); the "
    "window is block-partitioned, never global, so each block sorts "
    "locally after one shuffle. Single-pass SNM misses cross-block "
    "pairs by design; production recall runs a second pass with a "
    "rotated key.",
)
def dedup_sorted_neighborhood(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pairs = sorted_neighborhood_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        block_col="lang",
        window=3,
        prefix_len=12,
        min_len_ratio=0.8,
    )
    return pairs.orderBy("id_a", "id_b")


# ===========================================================================
# Oracle upgrade: ev_throttle_chained (batch 9, registered rows-only)
# is in fact DuckDB-expressible via a recursive CTE that walks each
# (user, type) group in rn order carrying the last-KEPT timestamp —
# exactly the previous-OUTPUT recurrence the Spark side runs in
# applyInPandas. Group sizes are small (events/user/type), so the
# recursion depth is bounded and cheap at oracle scale.
# ===========================================================================

# Same upgrade for the EWMA smoother: the recurrence ewma_i =
# (0.7*ewma + 0.3*v) / (0.7+0.3) is written EXACTLY as pandas
# ewm(adjust=False) evaluates it — including the divide by the
# (1-a)+a weight sum, which is 0.9999999999999999 in float64, NOT
# 1.0 — so the DuckDB walk is bit-identical to the applyInPandas
# result before rounding (verified: 0 bitwise mismatches over the
# sf0.01 purchase stream; the naive a*v + (1-a)*w form diverged in
# the last ulp and flipped a round-half boundary).
set_oracle(
    "ev_ewma_value",
    """
    WITH RECURSIVE seq AS (
      SELECT event_id, user_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), walk AS (
      SELECT event_id, user_id, ts, value, rn, value AS ewma
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_id, s.user_id, s.ts, s.value, s.rn,
             CASE WHEN s.value IS NULL THEN w.ewma
                  WHEN w.ewma IS NULL THEN s.value
                  ELSE ((1.0-0.3)*w.ewma + 0.3*s.value)
                       / ((1.0-0.3) + 0.3) END
      FROM walk w
      JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT event_id, user_id,
           floor(ewma * 1000000.0 + 0.5) / 1000000.0 AS ewma
    FROM walk ORDER BY event_id
    """,
)

set_oracle(
    "ev_throttle_chained",
    """
    WITH RECURSIVE seq AS (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), walk AS (
      SELECT event_id, user_id, event_type, ts, rn,
             ts AS last_kept, TRUE AS kept
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_id, s.user_id, s.event_type, s.ts, s.rn,
             CASE WHEN epoch(s.ts - w.last_kept) > 1800
                  THEN s.ts ELSE w.last_kept END,
             epoch(s.ts - w.last_kept) > 1800
      FROM walk w
      JOIN seq s ON s.user_id = w.user_id
                AND s.event_type = w.event_type
                AND s.rn = w.rn + 1
    )
    SELECT event_id, user_id, event_type, ts
    FROM walk WHERE kept ORDER BY event_id
    """,
)


# ===========================================================================
# S6+ upgrade: executor-parallel REST source via the Spark 4 Python
# Data Source API (one InputPartition per page)
# ===========================================================================

@register(
    "s6_rest_datasource_scan",
    """
    SELECT (i // 25)::INT AS page,
           printf('AG%05d', i) AS agency_id,
           'Agency ' || i AS name,
           CASE i % 3 WHEN 0 THEN 'ACTIVE'
                      WHEN 1 THEN 'PENDING'
                      ELSE 'CLOSED' END AS status,
           ((i * 7) % 200)::BIGINT AS license_capacity
    FROM (SELECT unnest(generate_series(0, 99)) AS i)
    ORDER BY agency_id
    """,
    "Paginated REST ingestion as a native Spark 4 Python Data Source "
    "(spark.read.format('rest_pages')): every page is an "
    "InputPartition, so the fetch fans out across EXECUTORS — the "
    "scale path past io.from_api_rows's driver-side materialization. "
    "Task retry = per-page retry; results land already partitioned. "
    "Deterministic synthetic transport here (same JSON wire shape, "
    "closed-form oracle); the http transport swaps in via "
    "mode=http/base_url with identical plumbing.",
)
def s6_rest_datasource_scan(spark, sf_dir):
    from mcyj_datapipeline_spark.sources import register_rest_source

    register_rest_source(spark)
    return (
        spark.read.format("rest_pages")
        .option("pages", "4")
        .option("page_size", "25")
        .load()
        .orderBy("agency_id")
    )


# ===========================================================================
# E11 flagship: entity resolution (blocking -> scoring -> clustering ->
# canonicalization) as one declarative composition
# ===========================================================================

@register(
    "e11_entity_resolution_pipeline",
    """
    WITH RECURSIVE norm AS (
      SELECT doc_id, lang, n_chars,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS sk
      FROM documents
    ), lagd AS (
      SELECT doc_id, sk,
             lag(doc_id, 1) OVER w AS d1, lag(sk, 1) OVER w AS s1,
             lag(doc_id, 2) OVER w AS d2, lag(sk, 2) OVER w AS s2,
             lag(doc_id, 3) OVER w AS d3, lag(sk, 3) OVER w AS s3
      FROM norm
      WINDOW w AS (PARTITION BY lang, substr(sk, 1, 1)
                   ORDER BY sk, doc_id)
    ), cand AS (
      SELECT d1 AS id_a, doc_id AS id_b, s1 AS sk_a, sk AS sk_b
      FROM lagd WHERE d1 IS NOT NULL
      UNION ALL
      SELECT d2, doc_id, s2, sk FROM lagd WHERE d2 IS NOT NULL
      UNION ALL
      SELECT d3, doc_id, s3, sk FROM lagd WHERE d3 IS NOT NULL
    ), pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE substr(sk_a, 1, 12) = substr(sk_b, 1, 12)
        AND greatest(length(sk_a), length(sk_b)) > 0
        AND least(length(sk_a), length(sk_b))::DOUBLE
            / greatest(length(sk_a), length(sk_b)) >= 0.8
        AND 1.0 - levenshtein(sk_a, sk_b)::DOUBLE
                  / greatest(length(sk_a), length(sk_b)) >= 0.75
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), walk(node, comp) AS (
      SELECT u, u FROM und
      UNION
      SELECT und.v, walk.comp FROM walk JOIN und ON und.u = walk.node
    ), clusters AS (
      SELECT node AS doc_id, min(comp) AS cluster_id FROM walk
      GROUP BY node
    ), ranked AS (
      SELECT c.cluster_id, c.doc_id, n.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY n.n_chars DESC, c.doc_id) AS rk
      FROM clusters c JOIN norm n ON n.doc_id = c.doc_id
    )
    SELECT cluster_id,
           count(*) AS n_members,
           min(doc_id) FILTER (rk = 1) AS canonical_doc,
           string_agg(doc_id, ',' ORDER BY doc_id) AS members
    FROM ranked GROUP BY cluster_id ORDER BY cluster_id
    """,
    "E11 flagship — record linkage end to end: SNM blocking (O(n*w) "
    "window lags, block-partitioned), pair scoring by normalized "
    "Levenshtein similarity (JVM levenshtein on the SAME canonical "
    "sort key the blocker used, computed only for the O(n*w) "
    "candidates — never all pairs), connected components over "
    "accepted matches (one shuffle/round min-label propagation with "
    "the pointer-jump valve), and canonicalization picking the "
    "longest member as the surviving record. Every stage is a "
    "bounded-fanout shuffle; the full pipeline is ONE lazy plan "
    "ending in a cluster-partitioned window, and swapping the SNM "
    "blocker for MinHash-LSH (higher recall) changes one line.",
)
def e11_entity_resolution_pipeline(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.dedup import (
        connected_components,
        snm_sort_key,
        sorted_neighborhood_pairs,
    )
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    cand = sorted_neighborhood_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        block_col="lang",
        window=3,
        prefix_len=12,
        min_len_ratio=0.8,
    ).select("id_a", "id_b")
    norm = docs.select("doc_id", snm_sort_key(F.col("text")).alias("sk"))
    pairs = (
        cand.join(
            norm.select(
                F.col("doc_id").alias("id_a"), F.col("sk").alias("sk_a")
            ),
            "id_a",
        )
        .join(
            norm.select(
                F.col("doc_id").alias("id_b"), F.col("sk").alias("sk_b")
            ),
            "id_b",
        )
        .filter(
            F.lit(1.0)
            - F.levenshtein("sk_a", "sk_b")
            / F.greatest(F.length("sk_a"), F.length("sk_b"))
            >= 0.75
        )
        .select("id_a", "id_b")
    )
    clusters = connected_components(pairs, "id_a", "id_b").select(
        F.col("doc_id"), F.col("cluster_id")
    )
    ranked = clusters.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id")
            )
        ),
    )
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "canonical_doc"
            ),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("members"),
        )
        .orderBy("cluster_id")
    )

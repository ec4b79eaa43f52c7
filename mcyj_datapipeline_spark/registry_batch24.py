"""Batch 24 registry entries (round 6, continued): TextRank keyword
extraction (weighted PageRank over the word co-occurrence graph) and
per-document similar-document search — graph analytics and dedup
machinery recomposed into the two retrieval-side features a corpus
platform exposes to users.

Reference provenance: the reference's keyword surface is a static
curated list (``map_keywords.py``); TextRank (Mihalcea & Tarau 2004,
public) is the unsupervised replacement that derives the keyword
ranking from the corpus itself. The similar-docs search recomposes
the exact n-gram Jaccard spine (``operators/dedup.py:225``) from
pair-emission into per-document top-k retrieval.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.registry import register

__all__ = ["text_textrank_keywords", "text_similar_docs_topk"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# TextRank: weighted PageRank over adjacent-word co-occurrence
# ===========================================================================

_TR_MIN_COUNT = 2
_TR_TOP_K = 25

_TR_ROUND = """
    r{r} AS (
      SELECT nd.node,
             (SELECT 0.15 / n FROM nn)
             + 0.85 * coalesce(m.mass, 0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst, sum(r.rank * e.c / dg.d) AS mass
        FROM edges e JOIN r{p} r ON r.node = e.src
                     JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst
      ) m ON m.dst = nd.node
    )"""


@register(
    "text_textrank_keywords",
    f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
               AS ws
      FROM documents
    ), big AS (
      SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b,
             count(*)::DOUBLE AS c
      FROM (
        SELECT unnest([ws[i] || ' ' || ws[i+1]
                       for i in range(1, len(ws))]) AS g
        FROM toks WHERE len(ws) >= 2
      ) GROUP BY 1, 2 HAVING count(*) >= {_TR_MIN_COUNT}
    ), edges AS (
      SELECT a AS src, b AS dst, c FROM big
      UNION ALL SELECT b, a, c FROM big
    ), nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT src, sum(c) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank FROM nodes),
    {_TR_ROUND.format(r=1, p=0)},
    {_TR_ROUND.format(r=2, p=1)},
    {_TR_ROUND.format(r=3, p=2)}
    SELECT node AS word, round(rank, 6) AS rank
    FROM r3 ORDER BY round(rank, 6) DESC, word LIMIT {_TR_TOP_K}
    """,
    "TextRank keyword extraction (Mihalcea & Tarau 2004): adjacent-"
    "word co-occurrences (count floor "
    f"{_TR_MIN_COUNT}) form a mirrored weighted word graph; 3 rounds "
    "of WEIGHTED PageRank (step probability proportional to edge "
    "count) rank the vocabulary; top-25 keywords emerge with no "
    "curated list and no training. The graph is vocabulary-sized — "
    "thousands of nodes regardless of corpus size — so after the one "
    "tokenize+bigram-count pass (map-side partial agg), every "
    "iteration shuffles KBs. Reuses operators/graph.py pagerank with "
    "its new weight column; the oracle unrolls the same weighted "
    "rounds as chained CTEs. The cut orders on round(rank, 6) with "
    "the word as tie-break.",
)
def text_textrank_keywords(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("text")
    ws = F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != "")
    toks = docs.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("a"),
                F.slice("ws", 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    big = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .filter(F.col("c") >= _TR_MIN_COUNT)
    )
    edges = big.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "c"
    ).union(big.select("b", "a", "c"))
    ranks = pagerank(edges, iterations=3, damping=0.85, weight="c")
    return (
        ranks.select(
            F.col("node").alias("word"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), "word")
        .limit(_TR_TOP_K)
    )


# ===========================================================================
# Similar-document search: per-doc top-k by exact n-gram Jaccard
# ===========================================================================

_SIM_THRESHOLD = 0.2
_SIM_K = 3


@register(
    "text_similar_docs_topk",
    f"""
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
    ), pairs AS (
      SELECT s.id_a, s.id_b,
             round(s.shared::DOUBLE
                   / (len(a.sh) + len(b.sh) - s.shared), 6) AS jaccard
      FROM shared s JOIN sh a ON s.id_a = a.doc_id
                    JOIN sh b ON s.id_b = b.doc_id
      WHERE s.shared::DOUBLE / (len(a.sh) + len(b.sh) - s.shared)
            >= {_SIM_THRESHOLD}
    ), mirrored AS (
      SELECT id_a AS doc_id, id_b AS similar_id, jaccard FROM pairs
      UNION ALL
      SELECT id_b, id_a, jaccard FROM pairs
    )
    SELECT doc_id, similar_id, jaccard
    FROM mirrored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY jaccard DESC, similar_id) <= {_SIM_K}
    ORDER BY doc_id, jaccard DESC, similar_id
    """,
    "Similar-document search: for every document, its top-3 most "
    "similar others by EXACT trigram Jaccard — the dedup pair spine "
    "(operators/dedup.py ngram_jaccard_pairs, threshold "
    f"{_SIM_THRESHOLD}) recomposed from pair emission into per-doc "
    "retrieval: pairs mirror both directions and a window PARTITIONED "
    "BY doc_id keeps rank <= 3 on (rounded jaccard, id) — the window "
    "runs over the pairs relation (already threshold-pruned and far "
    "smaller than the corpus), never the documents. At 100 TB the "
    "shared-shingle index carries the same stop-shingle valve as the "
    "dedup path; everything downstream is pair-grain.",
)
def text_similar_docs_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=_SIM_THRESHOLD)
    mirrored = pairs.select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("similar_id"),
        "jaccard",
    ).union(
        pairs.select(F.col("id_b"), F.col("id_a"), "jaccard")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("jaccard"), "similar_id"
    )
    return (
        mirrored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _SIM_K)
        .drop("_rn")
        .orderBy("doc_id", F.desc("jaccard"), "similar_id")
    )

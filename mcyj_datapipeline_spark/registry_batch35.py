"""Batch 35 registry entries (round 6, continued): graph-core and
corpus-statistics completions —

- ``g7_kcore_membership``: the k-core (iterative sub-k peel) — the
  cohesion screen between per-node cc (local) and connected
  components (global), and the standard spam/bot-cluster filter.
- ``text_heaps_curve``: vocabulary-growth curve (Heaps' law) —
  cumulative distinct vocabulary vs cumulative tokens, the corpus
  statistic that says whether more data still buys new language.
- ``text_zipf_fit``: Zipf rank-frequency fit — log-log slope /
  intercept / correlation of term frequency against rank, the
  classic sanity check that a corpus (or a synthetic one) has a
  natural frequency profile.

Reference provenance: none direct — beyond-reference corpus
statistics per the SURVEY.md mandate (Seidman 1983 for k-core;
Heaps 1978; Zipf 1949).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "g7_kcore_membership",
    "text_heaps_curve",
    "text_zipf_fit",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# G7: k-core membership via fixed-round peel (unrolled-CTE oracle)
# ===========================================================================

_KCORE_K = 20
# Measured fixpoint: 3 peel rounds at sf0.001, 8 at sf0.01, 10 at
# sf0.1 — 12 covers all with margin; extra rounds are no-ops and the
# pytest asserts rounds+1 returns the identical set (fixpoint reached).
_KCORE_ROUNDS = 12

_KCORE_EDGES_SQL = """
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_quantity >= 25) l1
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_quantity >= 25) l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
"""


def _kcore_oracle_sql(
    k: int, rounds: int, edges_sql: str = _KCORE_EDGES_SQL
) -> str:
    """Unrolled peel: the same fixed number of rounds the Spark loop
    runs (the unrolled-PageRank oracle pattern). ``edges_sql`` lets
    variants (g7b's post-deletion graph, batch 50) peel a different
    edge set with the identical unrolling."""
    ctes = [f"e0 AS MATERIALIZED ({edges_sql})"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""k{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS d FROM (
          SELECT a AS node FROM e{r - 1}
          UNION ALL SELECT b FROM e{r - 1}
        ) GROUP BY node
      ) WHERE d >= {k}
    )"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
      SELECT a, b FROM e{r - 1}
      WHERE a IN (SELECT node FROM k{r})
        AND b IN (SELECT node FROM k{r})
    )"""
        )
    return f"""
    WITH {', '.join(ctes)}
    SELECT node FROM (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
      ) GROUP BY node
    ) WHERE d >= {k}
    ORDER BY node
    """


@register(
    "g7_kcore_membership",
    _kcore_oracle_sql(_KCORE_K, _KCORE_ROUNDS),
    f"k-core membership (k={_KCORE_K}) of the part co-purchase graph "
    "via the standard peel: drop every sub-k node, recompute degrees, "
    "repeat — run as a FIXED 12 rounds (measured fixpoint is 3/8/10 "
    "rounds at the three SFs; extra rounds are no-ops) so the DuckDB "
    "twin can unroll the identical computation and a pytest can "
    "assert rounds+1 changes nothing. Each round is one degree "
    "groupBy plus two node-key semi-joins on the surviving edge "
    "list, checkpointed to keep lineage flat — at 100 TB that is "
    "O(rounds) edge shuffles with the edge list SHRINKING "
    "monotonically, and no driver-side data movement.",
)
def g7_kcore_membership(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.graph import kcore_nodes
    from mcyj_datapipeline_spark.registry_batch11 import copurchase_edges

    return kcore_nodes(
        copurchase_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


# ===========================================================================
# Heaps' law: vocabulary growth curve at doc-bucket grain
# ===========================================================================

# Bucket width is a fixed query parameter; at production corpus sizes
# it scales with the corpus so the bucket-grain relation (and the
# triangular cumulative join below) stays small.
_HEAPS_BUCKET = 50


@register(
    "text_heaps_curve",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'),
                                w -> w <> '')) AS term
      FROM documents
    ), bt AS (
      SELECT doc_id // {_HEAPS_BUCKET} AS bucket, count(*) AS n_tok
      FROM toks GROUP BY 1
    ), fs AS (
      SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY term
    ), bn AS (
      SELECT first_doc // {_HEAPS_BUCKET} AS bucket, count(*) AS n_new
      FROM fs GROUP BY 1
    )
    SELECT bt.bucket,
           (sum(bt.n_tok) OVER (ORDER BY bt.bucket
              ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens,
           (sum(coalesce(bn.n_new, 0)) OVER (ORDER BY bt.bucket
              ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_vocab
    FROM bt LEFT JOIN bn ON bn.bucket = bt.bucket
    ORDER BY bt.bucket
    """,
    "Vocabulary-growth (Heaps'-law) curve: cumulative distinct "
    "vocabulary vs cumulative token count at doc-bucket grain "
    f"(width {_HEAPS_BUCKET}). Distinct-so-far reduces to FIRST-SEEN "
    "doc per term (the w7 rewrite — one term groupBy, never an "
    "expanding COUNT DISTINCT), both series roll up to bucket grain, "
    "and the running totals come from a triangular broadcast join on "
    "the tiny bucket relation, not a global window. At 100 TB: one "
    "tokenize pass, one term-key shuffle, one bucket rollup — the "
    "curve that says whether more data still buys new language.",
)
def text_heaps_curve(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    bt = toks.groupBy(
        F.expr(f"doc_id div {_HEAPS_BUCKET}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_tok"))
    fs = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    bn = fs.groupBy(
        F.expr(f"first_doc div {_HEAPS_BUCKET}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    grain = (
        bt.join(bn, "bucket", "left")
        .na.fill({"n_new": 0})
        .localCheckpoint(eager=False)
    )
    lo = grain.select(
        F.col("bucket").alias("b2"),
        F.col("n_tok").alias("t2"),
        F.col("n_new").alias("v2"),
    )
    return (
        grain.select("bucket")
        .join(F.broadcast(lo), F.col("b2") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("t2").alias("cum_tokens"),
            F.sum("v2").alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


# ===========================================================================
# Zipf rank-frequency fit over the term-frequency head
# ===========================================================================

_ZIPF_K = 10000  # fit the frequency head only — the power-law regime


@register(
    "text_zipf_fit",
    rf"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                w -> w <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT term, count(*) AS freq FROM toks GROUP BY term
    ), head AS (
      SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT {_ZIPF_K}
    ), ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
      FROM head
    )
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(freq::DOUBLE), ln(rank::DOUBLE)), 6)
             AS zipf_slope,
           round(regr_intercept(ln(freq::DOUBLE), ln(rank::DOUBLE)), 6)
             AS zipf_intercept,
           round(corr(ln(freq::DOUBLE), ln(rank::DOUBLE)), 6)
             AS loglog_corr
    FROM ranked
    """,
    "Zipf rank-frequency fit: least-squares slope / intercept / "
    "correlation of ln(frequency) against ln(rank) over the "
    f"top-{_ZIPF_K} frequency head — the corpus-naturalness sanity "
    "check (natural language sits near slope -1). Ranks are NOT a "
    "global window: the head is a TakeOrdered top-k, and rank within "
    "it is the deterministic (freq desc, term) triangular count over "
    "the broadcast K-row head — bounded work regardless of "
    "vocabulary size. One tokenize pass + one term groupBy touch the "
    "corpus; everything after is K rows.",
)
def text_zipf_fit(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(TA.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    head = (
        tf.orderBy(F.desc("freq"), "term")
        .limit(_ZIPF_K)
        .localCheckpoint(eager=False)
    )
    other = head.select(
        F.col("term").alias("t2"), F.col("freq").alias("f2")
    )
    ranked = (
        head.join(
            F.broadcast(other),
            (F.col("f2") > F.col("freq"))
            | ((F.col("f2") == F.col("freq")) & (F.col("t2") < F.col("term"))),
            "left",
        )
        .groupBy("term", "freq")
        .agg((F.count("t2") + 1).alias("rank"))
    )
    lf = F.log(F.col("freq").cast("double"))
    lr = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("zipf_intercept"),
        F.round(F.corr(lf, lr), 6).alias("loglog_corr"),
    )

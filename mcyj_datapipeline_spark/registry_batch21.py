"""Batch 21 registry entries (round 6, continued): corpus SELECTION
under a token budget, and quality-aware canonical choice inside
near-dup clusters — the two places a curation pipeline decides WHICH
data survives, not just which is duplicated.

Reference provenance: none direct — the reference keeps everything it
scrapes; these are the public-lineage curation decisions (C4/Gopher
quality gates -> "keep the best N tokens", near-dup canonicalization
in the Pile/RefinedWeb writeups keeps one representative per cluster)
expressed as declarative plans over the same `documents` table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import dedup as D
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import _REGISTRY, register
from mcyj_datapipeline_spark.registry_batch3 import _cluster_oracle_sql

__all__ = [
    "quality_token_budget_select",
    "e16_quality_canonical_rewrite",
]

_BUDGET_SHARE = 0.3  # keep the best docs up to 30% of corpus tokens
_Q_BIN_DP = 3  # quality histogram granularity for the no-global-sort plan


def _scored_sql() -> str:
    """Per-doc (quality, tokens) — the text_quality_score oracle's
    scoring expression with the token count riding along. Reused, not
    re-derived: the quality formula is the one already proven
    Spark==DuckDB by text_quality_score's own gate row."""
    quality_sql = _REGISTRY["text_quality_score"][1]
    return f"""
    SELECT q.doc_id, q.quality,
           len(list_filter(string_split_regex(d.text, '\\s+'),
                           t -> t <> '')) AS tokens
    FROM ({quality_sql}) q JOIN documents d ON q.doc_id = d.doc_id
    """


@register(
    "quality_token_budget_select",
    f"""
    WITH scored AS ({_scored_sql()}),
    tot AS (SELECT {_BUDGET_SHARE} * sum(tokens) AS budget FROM scored),
    ranked AS (
      SELECT doc_id, quality, tokens,
             (sum(tokens) OVER (ORDER BY quality DESC, doc_id
                                ROWS UNBOUNDED PRECEDING))::BIGINT
               AS cum_tokens
      FROM scored
    )
    SELECT doc_id, quality, tokens, cum_tokens
    FROM ranked CROSS JOIN tot WHERE cum_tokens <= budget
    """,
    "Token-budget corpus selection: keep the highest-quality documents "
    f"whose cumulative token count fits {_BUDGET_SHARE:.0%} of the "
    "corpus — the greedy quality-first prefix (by quality DESC, doc_id "
    "tie-break) that 'train on the best N tokens' curation runs. The "
    "oracle states it as the obvious global running sum; the Spark "
    "plan REFUSES the global sort that window implies: quality "
    f"histograms into {10**_Q_BIN_DP}+1 bins (round to {_Q_BIN_DP}dp "
    "— monotone, so bin order = quality order across bins), a "
    "bin-grain rollup + triangular self-join yields each bin's "
    "tokens-above, and the only per-row window is PARTITIONED by bin "
    "(cum within bin, ordered quality DESC then doc_id). Selection = "
    "tokens_above + within-bin cum <= budget, provably identical to "
    "the global prefix. At 100 TB: one scan to score, one scan to "
    "filter, bin relation is KBs; no single-reducer anything.",
)
def quality_token_budget_select(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.quality import token_budget_select

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        TA.quality_score(F.col("text")).alias("quality"),
        TA.token_count(F.col("text")).cast("bigint").alias("tokens"),
    ).localCheckpoint(eager=False)
    budget = scored.agg(
        (F.lit(_BUDGET_SHARE) * F.sum("tokens")).alias("budget")
    )
    return token_budget_select(scored, budget, bin_dp=_Q_BIN_DP).select(
        "doc_id", "quality", "tokens", "cum_tokens"
    )


@register(
    "e16_quality_canonical_rewrite",
    f"""
    WITH clusters AS ({_cluster_oracle_sql()}),
    scored AS ({_scored_sql()}),
    member AS (
      SELECT s.doc_id, s.quality,
             coalesce(c.cluster_id, s.doc_id) AS cluster_id
      FROM scored s LEFT JOIN clusters c ON s.doc_id = c.doc_id
    ), sized AS (
      SELECT cluster_id, count(*) AS n_members FROM member GROUP BY cluster_id
    )
    SELECT m.doc_id, m.quality, z.n_members
    FROM member m JOIN sized z ON m.cluster_id = z.cluster_id
    QUALIFY row_number() OVER (PARTITION BY m.cluster_id
                               ORDER BY m.quality DESC, m.doc_id) = 1
    """,
    "E16 flagship: near-dup corpus rewrite keeping each cluster's "
    "HIGHEST-QUALITY member (ties to smallest doc_id) instead of e6's "
    "min-id canonical — the curation-grade variant: when five near-"
    "copies survive scraping, keep the cleanest one, not the first "
    "one. Same bucketed spine as e6 (MinHash-LSH pairs -> connected "
    "components, no all-pairs anywhere); the quality score joins onto "
    "the tiny cluster map, the winner is a max_by(struct) argmax per "
    "cluster — no per-cluster window over the corpus — and singletons "
    "keep themselves via the left join's coalesce. At 100 TB the "
    "cluster map is pairs-sized (only docs WITH a near-dup), so the "
    "argmax shuffles a relation far smaller than the corpus.",
)
def e16_quality_canonical_rewrite(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", TA.quality_score(F.col("text")).alias("quality")
    )
    pairs = D.minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    clusters = D.connected_components(pairs, "id_a", "id_b").select(
        F.col("doc_id").alias("_m"), F.col("cluster_id").alias("_cl")
    )
    member = (
        scored.join(clusters, scored["doc_id"] == clusters["_m"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cl"), F.col("doc_id")))
        .drop("_m", "_cl")
        .localCheckpoint(eager=False)
    )
    per_cluster = member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(
            F.struct(
                F.col("quality"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("best"),
    )
    return per_cluster.select(
        F.col("best.doc_id").alias("doc_id"),
        F.col("best.quality").alias("quality"),
        "n_members",
    )

"""Batch 28 registry entries (round 6, continued): E17, the corpus
RELEASE flagship — exact dedup, quality gate, token-budget selection,
deterministic split, and the per-split datasheet, chained as ONE
declarative plan.

Reference provenance: the reference's run_full_pipeline.py is the
acquire-and-enrich half of a corpus program; E17 is the publish half
every public dataset lineage describes (C4/Pile/RefinedWeb release
sections): dedup -> gate -> select to a token budget -> split -> card.
Every stage reuses an operator already oracle-proven on its own
(dedup_exact_hash, text_quality_score, quality_token_budget_select,
split_train_val_test, e14's rollup shape), so this query pins their
COMPOSITION.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.hashing import hash60_sql
from mcyj_datapipeline_spark.registry import _REGISTRY, register

# scoring + publish halves shared with the streaming twin e17b
# (round 12) so the two paths cannot fork semantically
from mcyj_datapipeline_spark.streaming.release_fold import (
    _BUDGET_SHARE,
    _QUALITY_FLOOR,
    publish_release,
    score_documents,
)

__all__ = ["e17_corpus_release_pipeline"]


def _scored_sql() -> str:
    quality_sql = _REGISTRY["text_quality_score"][1]
    return f"""
    SELECT q.doc_id, d.lang, d.text, q.quality,
           len(list_filter(string_split_regex(d.text, '\\s+'),
                           t -> t <> '')) AS tokens
    FROM ({quality_sql}) q JOIN documents d ON q.doc_id = d.doc_id
    """


@register(
    "e17_corpus_release_pipeline",
    f"""
    WITH scored AS ({_scored_sql()}),
    deduped AS (
      SELECT doc_id, lang, quality, tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ), gated AS (
      SELECT * FROM deduped WHERE quality >= {_QUALITY_FLOOR}
    ), tot AS (SELECT {_BUDGET_SHARE} * sum(tokens) AS budget FROM gated),
    selected AS (
      SELECT doc_id, lang, quality, tokens FROM (
        SELECT *, (sum(tokens) OVER (ORDER BY quality DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING))::BIGINT
                  AS cum
        FROM gated
      ) CROSS JOIN tot WHERE cum <= budget
    ), split AS (
      SELECT *, CASE WHEN b < 1000 THEN 'val'
                     WHEN b < 2000 THEN 'test'
                     ELSE 'train' END AS split
      FROM (SELECT *, {hash60_sql("doc_id::VARCHAR")} % 10000 AS b
            FROM selected)
    )
    SELECT split, lang, count(*) AS n_docs,
           sum(tokens)::BIGINT AS tokens,
           round(avg(quality), 6) AS mean_quality
    FROM split GROUP BY split, lang ORDER BY split, lang
    """,
    "E17 corpus-release flagship: the PUBLISH half of a corpus "
    "program as one declarative plan — exact dedup (sha-256 digest "
    "groupBy, first-id wins), quality gate (floor "
    f"{_QUALITY_FLOOR}), token-budget selection (greedy quality "
    f"prefix at {_BUDGET_SHARE:.0%} of gated tokens, via the "
    "no-global-sort bin decomposition of quality_token_budget_select)"
    ", deterministic hash split (80/10/10), per-(split, lang) "
    "datasheet. Every stage reuses an operator oracle-proven alone; "
    "this pins their composition — the oracle chains the same five "
    "CTEs. One text-scoring scan feeds everything; the dedup shuffle "
    "carries digests, the budget machinery bins, the split is a pure "
    "map — no stage rescans the corpus.",
)
def e17_corpus_release_pipeline(spark, sf_dir):
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scored = score_documents(docs)
    w = Window.partitionBy("content_sha").orderBy("doc_id")
    deduped = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "quality", "tokens")
    )
    return publish_release(deduped)

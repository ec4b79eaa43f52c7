"""Batch 4 registry entries (round 2 continuation): corpus-cleaning
operators beyond the reference's own inventory — cross-document
boilerplate line removal (CCNet-style), Gopher line/n-gram repetition
filters, and SemDeDup semantic deduplication. All are first-class
training-data-pipeline components with full DuckDB value oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# Cross-document boilerplate line removal (CCNet-style)
# ===========================================================================

# Synthesized 3-word "lines" (this corpus is single-line; real corpora
# split on newline — the operator takes any (id, pos, line) frame).
_LINES_SQL = """
  SELECT doc_id, i AS pos,
         array_to_string(w[(i*3)+1:(i*3)+3], ' ') AS line
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       LATERAL (SELECT unnest(generate_series(
           0, greatest(0, (len(w) - 3 + 2) // 3))) AS i)
"""


@register(
    "text_boilerplate_removal",
    f"""
    WITH lines AS ({_LINES_SQL}),
    boiler AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS ndocs FROM lines GROUP BY line
      ) WHERE ndocs >= 3
    ),
    kept AS (
      SELECT l.* FROM lines l ANTI JOIN boiler b ON l.line = b.line
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(line, ' ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           coalesce(r.n_kept, 0) AS n_kept,
           t.n_lines - coalesce(r.n_kept, 0) AS n_dropped
    FROM (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id) t
    LEFT JOIN rebuilt r USING (doc_id)
    """,
    "Boilerplate removal (CCNet-style, public): lines appearing in >= 3 "
    "distinct documents are dropped corpus-wide and each document is "
    "reassembled from its surviving lines in order — explode + "
    "two-level count-distinct + anti-join + ordered reassembly; the "
    "shuffle carries (line, id) pairs, never document bodies",
)
def text_boilerplate_removal(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lines = TA.window_lines(docs, line_words=3)
    return TA.remove_boilerplate_lines(lines, min_docs=3)


# ===========================================================================
# Gopher line / n-gram repetition filters
# ===========================================================================


@register(
    "text_line_repetition_signals",
    f"""
    WITH lines AS ({_LINES_SQL}),
    pl AS (
      SELECT doc_id, line, len(line) AS ln, count(*) AS c
      FROM lines GROUP BY doc_id, line
    ),
    lsig AS (
      SELECT doc_id,
             round(1 - count(*) / sum(c), 6) AS dup_line_frac,
             round(sum(CASE WHEN c > 1 THEN c * ln ELSE 0 END)
                   / sum(c * ln), 6) AS dup_line_char_frac
      FROM pl GROUP BY doc_id
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g2 AS (
      SELECT doc_id, round(max(c) / sum(c), 6) AS top_bigram_share FROM (
        SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id, unnest(
            [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]) AS g
          FROM w WHERE len(w) >= 2
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ),
    g3 AS (
      SELECT doc_id, round(max(c) / sum(c), 6) AS top_trigram_share FROM (
        SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id, unnest(
            [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS g
          FROM w WHERE len(w) >= 3
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT l.doc_id, l.dup_line_frac, l.dup_line_char_frac,
           coalesce(g2.top_bigram_share, 0.0) AS top_bigram_share,
           coalesce(g3.top_trigram_share, 0.0) AS top_trigram_share
    FROM lsig l
    LEFT JOIN g2 USING (doc_id)
    LEFT JOIN g3 USING (doc_id)
    """,
    "Gopher repetition filters (Rae et al. 2021, public): duplicate-"
    "line fraction, duplicate-line CHARACTER fraction, and top 2-/3-"
    "gram share per document — the standard template/spam detectors of "
    "a corpus cleaning pass; explode + two-level partial aggs, no UDFs",
)
def text_line_repetition_signals(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TA.line_repetition_signals(docs, line_words=3)


# ===========================================================================
# SemDeDup: semantic deduplication over embeddings
# ===========================================================================

_SD_COS = """list_sum([{a}[i]::DOUBLE * {b}[i]::DOUBLE for i in range(1, len({a}) + 1)]) /
      (sqrt(list_sum([{a}[i]::DOUBLE * {a}[i]::DOUBLE for i in range(1, len({a}) + 1)])) *
       sqrt(list_sum([{b}[i]::DOUBLE * {b}[i]::DOUBLE for i in range(1, len({b}) + 1)])))"""


def _semdedup_oracle_sql(tau: float = 0.30, n_centroids: int = 16) -> str:
    cos_vc = _SD_COS.format(a="e.embedding", b="cent_vec")
    cos_ab = _SD_COS.format(a="a.v", b="b.v")
    return f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cent_vec
      FROM embeddings WHERE vec_id < {n_centroids}
    ), assigned AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT e.vec_id, e.embedding AS v, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({cos_vc}, 6) DESC, c.centroid_id) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), losers AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE round({cos_ab}, 6) >= {tau}
    )
    SELECT s.vec_id, s.centroid_id
    FROM assigned s ANTI JOIN losers l ON s.vec_id = l.vec_id
    """


@register(
    "dedup_semantic_semdedup",
    _semdedup_oracle_sql(),
    "SemDeDup (Abbas et al. 2023, public): semantic dedup — cluster "
    "the embedding space (broadcast-argmax assignment, corpus never "
    "shuffles), compare cosine pairs only WITHIN a cluster, drop any "
    "vector with a smaller-id near-duplicate. Quadratic term bounded "
    "by the largest cluster, k scales with the corpus; tau=0.30 here "
    "because the synthetic embeddings have no true near-dups (real "
    "corpora run ~0.95) — the prune path is what is under test",
)
def dedup_semantic_semdedup(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.similarity import (
        semantic_dedup_winners,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_winners(emb, tau=0.30, n_centroids=16)


# ===========================================================================
# ML quality classifier (pyspark.ml, fastText-style weak supervision)
# ===========================================================================

_QUALITY_MODELS: dict[str, object] = {}


def _fitted_quality_model(spark, sf_dir):
    """Train-once-per-process model fixture (cached by sf_dir).

    Production shape: training is a one-time sampled job; scoring is
    the path that must scale. The fitted pipeline is persisted to a
    session scratch dir and RELOADED, so the scoring query runs exactly
    what a production model-load would (tests/test_ml_quality.py
    round-trips persistence byte-identically)."""
    if sf_dir not in _QUALITY_MODELS:
        import os

        from pyspark.ml import PipelineModel

        from mcyj_datapipeline_spark.operators.ml_quality import (
            train_quality_classifier,
            weak_quality_labels,
        )
        from mcyj_datapipeline_spark.session import session_scratch

        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        labeled = weak_quality_labels(docs).persist()
        try:
            # max_iter=8: on the weakly-labeled bands L-BFGS converges in
            # a handful of rounds; each extra round is a full distributed
            # job whose scheduler overhead dominates at any data size.
            model = train_quality_classifier(
                labeled, num_features=1 << 14, max_iter=8
            )
        finally:
            labeled.unpersist()
        path = os.path.join(
            session_scratch("ml_quality_model"),
            sf_dir.rstrip("/").rsplit("/", 1)[-1],
        )
        model.write().overwrite().save(path)
        _QUALITY_MODELS[sf_dir] = PipelineModel.load(path)
    return _QUALITY_MODELS[sf_dir]


@register(
    "ml_quality_classifier_score",
    None,  # model scores are seeded-training outputs → rows-only
    "ML quality SCORING (public GPT-3/LLaMA corpus-filter pattern): "
    "score the corpus with a persisted fitted model (trained once per "
    "process by ml_quality_train's path, reloaded from disk). Pure map "
    "stage — broadcast coefficients, no Exchange (asserted in "
    "tests/test_ml_quality.py). One score row per document. The "
    "headline bench times THIS path: at 100 TB scoring runs per-batch "
    "forever, training is a one-time sampled job.",
)
def ml_quality_classifier_score(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.ml_quality import score_quality

    model = _fitted_quality_model(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return score_quality(model, docs).select(
        "doc_id", F.round("ml_quality_prob", 4).alias("ml_quality_prob")
    )


@register(
    "ml_quality_train",
    None,  # iterative L-BFGS training is not SQL-expressible → rows-only
    "ML quality TRAINING (non-headline; the one-time sampled job): "
    "weak labels from the heuristic quality score, hashed word+bigram "
    "features, distributed logistic regression (L-BFGS over executor "
    "partials — only the coefficient vector lands on the driver). "
    "Returns a one-row model summary (training-set size per class, "
    "intercept, coefficient L2 norm) so the driver gate exercises the "
    "full fit path.",
)
def ml_quality_train(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.ml_quality import (
        train_quality_classifier,
        weak_quality_labels,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = weak_quality_labels(docs).persist()
    try:
        n_pos = labeled.filter(F.col("label") == 1.0).count()
        n_neg = labeled.filter(F.col("label") == 0.0).count()
        model = train_quality_classifier(
            labeled, num_features=1 << 14, max_iter=8
        )
    finally:
        labeled.unpersist()
    lr = model.stages[-1]
    import math

    coef_l2 = math.sqrt(sum(v * v for v in lr.coefficients.toArray()))
    return spark.createDataFrame(
        [(n_pos, n_neg, round(float(lr.intercept), 4), round(coef_l2, 4))],
        "n_pos long, n_neg long, intercept double, coef_l2 double",
    )

"""Batch 32 registry entries (round 6, continued): monitoring and
evaluation primitives the inventory still lacked —

- ``ev_cusum_changepoint``: two-sided CUSUM mean-shift detection over
  per-type daily event counts — the classic sequential changepoint
  monitor for ingest-volume regressions.
- ``text_readability``: Flesch reading-ease per document from
  deterministic word / sentence / vowel-group-syllable counters — a
  pure-column quality signal next to the existing length/stopword
  heuristics.
- ``dq7_cohens_kappa``: Cohen's kappa agreement between two
  independent labeling heuristics — the standard chance-corrected
  agreement statistic any labeling pipeline reports before trusting
  a single rater.
- ``a24_approx_quantile_contract``: the ε-contract oracle for
  ``percentile_approx`` (the q1b/HLL pattern): the query measures the
  achieved rank error of the sketch against its published ``1/accuracy``
  bound and returns the assertion, so the hash compare fails if the
  sketch ever degrades.

Reference provenance: none direct — beyond-reference monitoring ops
per the SURVEY.md mandate; CUSUM follows Page (1954) with the
standard k/h parameterization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "ev_cusum_changepoint",
    "text_readability",
    "dq7_cohens_kappa",
    "a24_approx_quantile_contract",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


def _stable(c):
    """Cross-engine-stable 6dp rounding (the ts3 pattern)."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# ===========================================================================
# CUSUM changepoint detection over daily ingest volume
# ===========================================================================

_CUSUM_K_FRAC = 0.25  # allowance k = 0.25 * mu (exact binary fraction)
_CUSUM_H_FRAC = 1.0  # alarm threshold h = mu


@register(
    "ev_cusum_changepoint",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, ts::DATE AS d, count(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT event_type, d, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             avg(x) OVER (PARTITION BY event_type) AS mu
      FROM daily
    ), walk AS (
      SELECT event_type, d, x, rn, mu,
             greatest(0.0, 0.0 + ((x - mu) - {_CUSUM_K_FRAC} * mu)) AS sp,
             greatest(0.0, 0.0 + ((mu - x) - {_CUSUM_K_FRAC} * mu)) AS sm
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.d, s.x, s.rn, s.mu,
             greatest(0.0, w.sp + ((s.x - s.mu) - {_CUSUM_K_FRAC} * s.mu)),
             greatest(0.0, w.sm + ((s.mu - s.x) - {_CUSUM_K_FRAC} * s.mu))
      FROM walk w
      JOIN seq s ON s.event_type = w.event_type AND s.rn = w.rn + 1
    )
    SELECT event_type, d, x::BIGINT AS x,
           floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mu,
           floor(sp * 1000000.0 + 0.5) / 1000000.0 AS sp,
           floor(sm * 1000000.0 + 0.5) / 1000000.0 AS sm,
           (sp > {_CUSUM_H_FRAC} * mu OR sm > {_CUSUM_H_FRAC} * mu) AS alarm
    FROM walk ORDER BY event_type, d
    """,
    "Two-sided CUSUM mean-shift monitor (Page 1954) over per-type "
    "daily event counts: allowance k=0.25*mu, threshold h=mu — the "
    "sequential detector that flags sustained ingest-volume drift "
    "long before a fixed-threshold alert would. The max(0,.) clamp "
    "kills any prefix-sum rewrite, so it is the ordered-partition-map "
    "recurrence (one shuffle on event_type over the DAY-GRAIN rollup, "
    "never the raw stream) with a recursive-CTE DuckDB twin in the "
    "identical operation order; counts are exact integers so mu and "
    "every partial sum agree bit-for-bit before the 6dp floor.",
)
def ev_cusum_changepoint(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.sequential import cusum_per_key

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    out = cusum_per_key(
        daily,
        ["event_type"],
        "d",
        "x",
        k_frac=_CUSUM_K_FRAC,
        h_frac=_CUSUM_H_FRAC,
    )
    return out.select(
        "event_type",
        "d",
        F.col("x").cast("long").alias("x"),
        _stable(F.col("mu")).alias("mu"),
        _stable(F.col("sp")).alias("sp"),
        _stable(F.col("sm")).alias("sm"),
        "alarm",
    ).orderBy("event_type", "d")


# ===========================================================================
# Flesch reading-ease readability
# ===========================================================================


@register(
    "text_readability",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'),
                         w -> w <> '') AS ws,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences
      FROM documents
    ), c AS (
      SELECT doc_id, lang, len(ws) AS n_words, n_sentences,
             list_sum(list_transform(ws, w -> greatest(
               len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)))
               AS n_syllables
      FROM t WHERE len(ws) > 0
    )
    SELECT doc_id, lang,
           n_words::BIGINT AS n_words,
           n_sentences::BIGINT AS n_sentences,
           n_syllables::BIGINT AS n_syllables,
           floor(((206.835 - 1.015 * (n_words::DOUBLE / n_sentences))
                  - 84.6 * (n_syllables::DOUBLE / n_words))
                 * 1000000.0 + 0.5) / 1000000.0 AS flesch
    FROM c ORDER BY doc_id
    """,
    "Flesch reading-ease per document: words (whitespace tokens), "
    "sentences (terminal-punctuation runs, floor 1), syllables "
    "(per-word vowel-group runs, floor 1 — the standard cheap "
    "estimator), then 206.835 - 1.015*(w/s) - 84.6*(sy/w). Everything "
    "is higher-order array expressions — zero UDFs, one scan, no "
    "shuffle; the identical left-associated arithmetic runs in both "
    "engines on exact integer counts, so the doubles agree before "
    "the 6dp floor. At 100 TB this is the same embarrassingly "
    "parallel map as the other quality signals.",
)
def text_readability(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.size(TA.tokens(F.col("text"))).alias("n_words"),
        TA.sentence_count(F.col("text")).alias("n_sentences"),
        TA.syllable_count(F.col("text")).alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    flesch = (F.lit(206.835) - F.lit(1.015) * wps) - F.lit(84.6) * spw
    return t.select(
        "doc_id",
        "lang",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        _stable(flesch).alias("flesch"),
    ).orderBy("doc_id")


# ===========================================================================
# Cohen's kappa between two labeling heuristics
# ===========================================================================

_KAPPA_CHARS = 300  # rater A: n_chars >= 300 -> "long"
_KAPPA_WORDS = 55  # rater B: n_words >= 55 -> "long"


@register(
    "dq7_cohens_kappa",
    rf"""
    WITH r AS (
      SELECT (n_chars >= {_KAPPA_CHARS}) AS a,
             (len(list_filter(string_split_regex(text, '\s+'),
                              w -> w <> '')) >= {_KAPPA_WORDS}) AS b
      FROM documents
    ), agg AS (
      SELECT count(*)::DOUBLE AS n,
             sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::DOUBLE AS n11,
             sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::DOUBLE AS n10,
             sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::DOUBLE AS n01,
             sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::DOUBLE
               AS n00
      FROM r
    ), stats AS (
      SELECT n, (n11 + n00) / n AS po,
             ((n11 + n10) / n) * ((n11 + n01) / n)
               + ((n01 + n00) / n) * ((n10 + n00) / n) AS pe
      FROM agg
    )
    SELECT n::BIGINT AS n_docs,
           floor(po * 1000000.0 + 0.5) / 1000000.0 AS po,
           floor(pe * 1000000.0 + 0.5) / 1000000.0 AS pe,
           floor(((po - pe) / (1.0 - pe)) * 1000000.0 + 0.5)
             / 1000000.0 AS kappa
    FROM stats
    """,
    "Cohen's kappa between two independent 'long document' raters "
    f"(chars >= {_KAPPA_CHARS} vs whitespace tokens >= {_KAPPA_WORDS}) "
    "— the chance-corrected agreement statistic a labeling pipeline "
    "reports before trusting either heuristic alone. One scan, one "
    "4-cell conditional aggregate; po/pe/kappa are exact-integer-count "
    "arithmetic written in the identical operation order in both "
    "engines. At 100 TB the confusion matrix is a map-side partial "
    "aggregate — 4 longs per partition cross the wire.",
)
def dq7_cohens_kappa(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    r = docs.select(
        (F.col("n_chars") >= _KAPPA_CHARS).alias("a"),
        (F.size(TA.tokens(F.col("text"))) >= _KAPPA_WORDS).alias("b"),
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("double")
        .alias("n11"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("double")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("double")
        .alias("n01"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("double")
        .alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = ((F.col("n11") + F.col("n10")) / F.col("n")) * (
        (F.col("n11") + F.col("n01")) / F.col("n")
    ) + ((F.col("n01") + F.col("n00")) / F.col("n")) * (
        (F.col("n10") + F.col("n00")) / F.col("n")
    )
    stats = agg.select(
        F.col("n"), po.alias("po"), pe.alias("pe")
    )
    # try_divide: pe == 1 (degenerate marginals — every doc in one
    # cell) must yield NULL, not an ANSI DIVIDE_BY_ZERO crash
    kappa = F.try_divide(
        F.col("po") - F.col("pe"), F.lit(1.0) - F.col("pe")
    )
    return stats.select(
        F.col("n").cast("long").alias("n_docs"),
        _stable(F.col("po")).alias("po"),
        _stable(F.col("pe")).alias("pe"),
        _stable(kappa).alias("kappa"),
    )


# ===========================================================================
# approx-quantile rank-error contract (the q1b / HLL epsilon pattern)
# ===========================================================================

_AQ_QS = (0.5, 0.9, 0.99)
_AQ_ACCURACY = 1000


@register(
    "a24_approx_quantile_contract",
    f"""
    SELECT q, (SELECT count(*) FROM lineitem) AS n_rows,
           true AS within_bound
    FROM (VALUES (0.5), (0.9), (0.99)) v(q)
    ORDER BY q
    """,
    "The mergeable-quantile-sketch contract, value-oracled like the "
    "HLL/int8 epsilon pattern: percentile_approx(l_extendedprice, q, "
    f"accuracy={_AQ_ACCURACY}) publishes rank error <= n/accuracy; the "
    "query joins each sketch output back against the column, measures "
    "the TRUE rank of the returned value, and asserts "
    "|rank - q*n| <= n/accuracy (+1 for boundary ties) in-plan — the "
    "hash compare fails if the sketch ever degrades. This is the "
    "sketch every SCALE.md percentile note promises to swap in at "
    "100 TB, so its error bound deserves its own gate; the rank "
    "re-measure is one broadcast of 3 cut values + one conditional "
    "aggregate over the scan.",
)
def a24_approx_quantile_contract(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = list(_AQ_QS)
    sk = li.agg(
        F.percentile_approx(
            "l_extendedprice", qs, _AQ_ACCURACY
        ).alias("vs"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.posexplode("vs").alias("qi", "v"), "n_rows"
    )
    ranks = (
        li.crossJoin(F.broadcast(sk))
        .groupBy("qi", "v", "n_rows")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("v"), 1).otherwise(
                    0
                )
            ).alias("rank")
        )
    )
    q = F.element_at(
        F.array(*[F.lit(x) for x in qs]), F.col("qi") + 1
    )
    bound = F.col("n_rows") / F.lit(float(_AQ_ACCURACY)) + F.lit(1.0)
    within = (
        F.abs(F.col("rank") - q * F.col("n_rows")) <= bound
    )
    return ranks.select(
        q.alias("q"),
        "n_rows",
        within.alias("within_bound"),
    ).orderBy("q")

"""Batch 33 registry entries (round 6, continued): linkage and
monitoring completions —

- ``er_jaro_winkler_vocab``: blocked fuzzy vocabulary linkage with a
  custom Jaro-Winkler kernel (Spark has no built-in; the pandas-UDF
  kernel is value-oracled against DuckDB's native
  ``jaro_winkler_similarity`` — a full cross-engine check of a custom
  Python kernel, not just a rows-only smoke).
- ``ts5_dow_baseline_anomaly``: day-of-week seasonal baseline +
  MAD-residual outlier flags — the seasonal monitor next to PSI
  (distribution drift) and CUSUM (mean shift).
- ``ml_calibration_bins``: reliability-diagram bins + per-bin Brier
  score for the deterministic quality score against a binary label —
  the calibration readout a filtering pipeline checks before using a
  score as a keep/drop gate.

Reference provenance: none direct — beyond-reference curation ops per
the SURVEY.md mandate (Winkler 1990 for the JW variant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators import text_analysis as TA
from mcyj_datapipeline_spark.registry import _REGISTRY, register

__all__ = [
    "er_jaro_winkler_vocab",
    "ts5_dow_baseline_anomaly",
    "ml_calibration_bins",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


from mcyj_datapipeline_spark.functions.numerics import stable6 as _stable  # noqa: E402


# ===========================================================================
# Fuzzy vocabulary linkage via Jaro-Winkler
# ===========================================================================

_JW_MIN = 0.605  # between the 0.6 and 0.6111 clusters — no boundary pair
_JW_LEN_DIFF = 2


@register(
    "er_jaro_winkler_vocab",
    rf"""
    WITH vocab AS (
      SELECT DISTINCT unnest(list_filter(
        string_split_regex(text, '\s+'), w -> w <> '')) AS w
      FROM documents
    )
    SELECT a.w AS w1, b.w AS w2,
           floor(jaro_winkler_similarity(a.w, b.w) * 1000000.0 + 0.5)
             / 1000000.0 AS jw
    FROM vocab a JOIN vocab b
      ON substr(a.w, 1, 1) = substr(b.w, 1, 1)
     AND abs(length(a.w) - length(b.w)) <= {_JW_LEN_DIFF}
     AND a.w < b.w
    WHERE jaro_winkler_similarity(a.w, b.w) >= {_JW_MIN}
    ORDER BY w1, w2
    """,
    "Blocked fuzzy vocabulary linkage: distinct corpus tokens "
    "self-joined inside (first-char, ±2 length) blocks and scored "
    "with a custom Jaro-Winkler pandas-UDF kernel (Spark ships no "
    "built-in — levenshtein is its only edit metric). The kernel is "
    "the textbook Winkler-1990 variant, which DuckDB ships natively — "
    "so this is a FULL value oracle over a custom Python kernel, "
    "verifying the implementation char-window by char-window. Plan: "
    "the distinct() is the only corpus-sized stage; the self-join "
    "runs on the tiny vocabulary relation with blocking keeping pair "
    "counts near-linear; the UDF sees only blocked candidates, "
    "Arrow-batched.",
)
def er_jaro_winkler_vocab(spark, sf_dir):
    from mcyj_datapipeline_spark.operators.linkage import fuzzy_vocab_pairs

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TA.tokens(F.col("text"))).alias("w"))
    return fuzzy_vocab_pairs(
        toks, "w", min_jw=_JW_MIN, max_len_diff=_JW_LEN_DIFF
    )


# ===========================================================================
# Day-of-week baseline + MAD residual anomaly flags
# ===========================================================================


@register(
    "ts5_dow_baseline_anomaly",
    """
    WITH daily AS (
      SELECT event_type, ts::DATE AS d, count(*) AS x
      FROM events GROUP BY 1, 2
    ), wk AS (
      SELECT event_type, d, x, isodow(d) - 1 AS dow FROM daily
    ), med AS (
      SELECT event_type, dow, quantile_cont(x, 0.5) AS med
      FROM wk GROUP BY 1, 2
    ), dev AS (
      SELECT w.event_type, w.d, w.dow, w.x, m.med,
             abs(w.x - m.med) AS dv
      FROM wk w
      JOIN med m ON w.event_type = m.event_type AND w.dow = m.dow
    ), mad AS (
      SELECT event_type, dow, quantile_cont(dv, 0.5) AS mad
      FROM dev GROUP BY 1, 2
    )
    SELECT v.event_type, v.d, v.dow, v.x,
           floor(v.med * 1000000.0 + 0.5) / 1000000.0 AS med,
           floor(m.mad * 1000000.0 + 0.5) / 1000000.0 AS mad,
           (m.mad > 0 AND v.dv > 3 * m.mad) AS anomaly
    FROM dev v
    JOIN mad m ON v.event_type = m.event_type AND v.dow = m.dow
    ORDER BY v.event_type, v.d
    """,
    "Seasonal anomaly monitor: per (event_type, day-of-week) the "
    "baseline is the MEDIAN daily count and the scale is the MAD — "
    "robust twins of mean/stddev that one corrupted day cannot drag — "
    "and a day flags when its deviation exceeds 3 MAD. Completes the "
    "monitoring family: PSI = distribution drift, CUSUM = sustained "
    "mean shift, this = single-day seasonal outlier. All medians run "
    "on the DAY-GRAIN rollup (exact interpolated percentile — "
    "integer counts make every median/MAD an exact .0/.5 double, so "
    "the cross-engine compare and the 3-MAD threshold are "
    "bit-stable); at 100 TB the raw stream is touched once by the "
    "daily rollup and never again.",
)
def ts5_dow_baseline_anomaly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    wk = daily.withColumn("dow", F.weekday("d"))
    med = wk.groupBy("event_type", "dow").agg(
        F.percentile("x", F.lit(0.5)).alias("med")
    )
    dev = wk.join(med, ["event_type", "dow"]).withColumn(
        "dv", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "dow").agg(
        F.percentile("dv", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, ["event_type", "dow"])
        .select(
            "event_type",
            "d",
            "dow",
            "x",
            _stable(F.col("med")).alias("med"),
            _stable(F.col("mad")).alias("mad"),
            (
                (F.col("mad") > 0) & (F.col("dv") > 3 * F.col("mad"))
            ).alias("anomaly"),
        )
        .orderBy("event_type", "d")
    )


# ===========================================================================
# Score calibration: reliability bins + Brier score
# ===========================================================================


def _calibration_oracle_sql() -> str:
    quality_sql = _REGISTRY["text_quality_score"][1]
    return f"""
    WITH q AS ({quality_sql}),
    j AS (
      SELECT CAST(floor(q.quality * 1000000.0 + 0.5) AS BIGINT) AS q6,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
      FROM q JOIN documents d ON q.doc_id = d.doc_id
    )
    SELECT least(q6 // 100000, 9)::INT AS bin,
           count(*) AS n_docs,
           floor(((sum(q6)::DOUBLE / count(*)) / 1000000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS avg_quality,
           floor((sum(label)::DOUBLE / count(*))
                 * 1000000.0 + 0.5) / 1000000.0 AS pos_rate,
           floor(((sum((q6 - label * 1000000) * (q6 - label * 1000000))
                   ::DOUBLE / count(*)) / 1000000000000.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS brier
    FROM j GROUP BY 1 ORDER BY 1
    """


@register(
    "ml_calibration_bins",
    _calibration_oracle_sql(),
    "Score-calibration readout: decile reliability bins of the "
    "deterministic quality score against a binary label (lang='en') "
    "with per-bin mean score, positive rate, and Brier contribution — "
    "the diagram a pipeline checks before using a score as a "
    "keep/drop gate. Numerics run ENTIRELY in integer micro-units "
    "(score -> exact q6 bigint, Brier as exact integer "
    "sum-of-squares) so every per-bin sum is order-independent and "
    "the engines agree bit-for-bit before the final division — the "
    "same integer-cents lesson i2 institutionalized for money. One "
    "scan, one 4-column groupBy; map-side partials at any scale.",
)
def ml_calibration_bins(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    j = docs.select(
        F.floor(
            TA.quality_score(F.col("text")) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("q6"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    err = F.col("q6") - F.col("label") * F.lit(1000000)
    agg = (
        j.groupBy(
            F.least(F.expr("q6 div 100000"), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q6").alias("_sq"),
            F.sum("label").alias("_sl"),
            F.sum(err * err).alias("_se2"),
        )
    )
    n = F.col("n_docs")
    return agg.select(
        "bin",
        "n_docs",
        _stable(
            (F.col("_sq").cast("double") / n) / F.lit(1000000.0)
        ).alias("avg_quality"),
        _stable(F.col("_sl").cast("double") / n).alias("pos_rate"),
        _stable(
            (F.col("_se2").cast("double") / n) / F.lit(1000000000000.0)
        ).alias("brier"),
    ).orderBy("bin")

"""Batch 37 registry entries (round 6, continued): time-series
diagnostics and the monitoring flagship —

- ``ts6_autocorrelation``: per-type daily-count autocorrelation at
  lags 1/2/7 — the seasonality/persistence diagnostic that says
  WHICH monitor (CUSUM vs day-of-week baseline) fits a series.
- ``e18_corpus_health_scorecard``: the monitoring FLAGSHIP — one
  plan that boils six registered signal families (PSI drift, CUSUM
  alarms, seasonal anomalies, exact-dup rate, OOV rate, rater
  agreement) down to a (signal, value) scorecard. Composition is the
  point: the Spark side reuses the registered query callables, the
  oracle CTE-wraps their proven SQL twins — so the scorecard can
  never drift from the signals it summarizes.

Reference provenance: none direct — beyond-reference monitoring per
the SURVEY.md mandate (Box-Jenkins for ACF).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import _REGISTRY, register

# The scorecard oracle below composes _REGISTRY entries AT IMPORT TIME;
# import their registrar modules first so this module is order-safe
# even under a direct `import registry_batch37` (dedup_exact_hash /
# text_vocab_oov_rate's registrars load via registry itself or below).
from mcyj_datapipeline_spark import registry_batch13  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch20  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch32  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch33  # noqa: E402,F401

__all__ = [
    "ts6_autocorrelation",
    "e18_corpus_health_scorecard",
]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ===========================================================================
# ACF of daily event counts at lags 1, 2, 7
# ===========================================================================

_ACF_LAGS = (1, 2, 7)


@register(
    "ts6_autocorrelation",
    f"""
    WITH daily AS (
      SELECT event_type, ts::DATE AS d, count(*) AS x
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, x,
             {', '.join(f'lag(x, {L}) OVER w AS x{L}' for L in _ACF_LAGS)}
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ), per_type AS (
      SELECT event_type,
             {', '.join(f'round(corr(x, x{L}), 6) AS acf{L}'
                        for L in _ACF_LAGS)}
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, lag, acf FROM (
      {' UNION ALL '.join(
          f"SELECT event_type, {L} AS lag, acf{L} AS acf FROM per_type"
          for L in _ACF_LAGS)}
    ) ORDER BY event_type, lag
    """,
    "Autocorrelation of per-type daily event counts at lags 1, 2, "
    "and 7 — the Box-Jenkins diagnostic that says whether a series "
    "is persistent (high lag-1: CUSUM fits), weekly-seasonal (high "
    "lag-7: the day-of-week baseline fits), or white (fixed "
    "thresholds suffice). Lag pairs come from key-partitioned "
    "windows over the DAY-GRAIN rollup; corr is one grouped "
    "aggregate per type; the lag unpivot runs on the type-grain "
    "result. One raw-stream pass total.",
)
def ts6_autocorrelation(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        *[F.lag("x", L).over(w).alias(f"x{L}") for L in _ACF_LAGS],
    )
    # corr spelled as try_divide(covar, sd*sd): F.corr's internal
    # division throws DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    # when a series is degenerate (two active days, or constant daily
    # counts); try_divide yields NULL there — matching DuckDB's corr.
    # The x side is masked to rows where the lag EXISTS so all three
    # aggregates see exactly the complete pairs, like corr itself.
    def _acf(lag_name):
        xp = F.when(F.col(lag_name).isNotNull(), F.col("x"))
        return F.round(
            F.try_divide(
                F.covar_samp(xp, F.col(lag_name)),
                F.stddev_samp(xp) * F.stddev_samp(lag_name),
            ),
            6,
        )

    per_type = lagged.groupBy("event_type").agg(
        *[_acf(f"x{L}").alias(f"acf{L}") for L in _ACF_LAGS]
    )
    stack = ", ".join(f"{L}, acf{L}" for L in _ACF_LAGS)
    return (
        per_type.select(
            "event_type",
            F.expr(f"stack({len(_ACF_LAGS)}, {stack}) AS (lag, acf)"),
        )
        .orderBy("event_type", "lag")
    )


# ===========================================================================
# E18: the corpus-health scorecard flagship
# ===========================================================================


def _scorecard_oracle_sql() -> str:
    psi = _REGISTRY["ml_psi_drift"][1]
    cusum = _REGISTRY["ev_cusum_changepoint"][1]
    dow = _REGISTRY["ts5_dow_baseline_anomaly"][1]
    dup = _REGISTRY["dedup_exact_hash"][1]
    oov = _REGISTRY["text_vocab_oov_rate"][1]
    kappa = _REGISTRY["dq7_cohens_kappa"][1]
    return f"""
    WITH psi_q AS ({psi}), cusum_q AS ({cusum}), dow_q AS ({dow}),
         dup_q AS ({dup}), oov_q AS ({oov}), kappa_q AS ({kappa})
    SELECT * FROM (
      SELECT 'cusum_alarm_days' AS signal,
             (sum(CASE WHEN alarm THEN 1 ELSE 0 END))::DOUBLE AS value
      FROM cusum_q
      UNION ALL
      SELECT 'dow_anomaly_days',
             (sum(CASE WHEN anomaly THEN 1 ELSE 0 END))::DOUBLE
      FROM dow_q
      UNION ALL
      SELECT 'exact_dup_rate',
             floor(((sum(n_copies) - count(*))::DOUBLE / sum(n_copies))
                   * 1000000.0 + 0.5) / 1000000.0
      FROM dup_q
      UNION ALL
      SELECT 'oov_rate',
             floor((sum(n_oov)::DOUBLE / sum(n_tokens))
                   * 1000000.0 + 0.5) / 1000000.0
      FROM oov_q
      UNION ALL
      SELECT 'psi_total', max(psi_total) FROM psi_q
      UNION ALL
      SELECT 'rater_kappa', max(kappa) FROM kappa_q
    ) ORDER BY signal
    """


@register(
    "e18_corpus_health_scorecard",
    _scorecard_oracle_sql(),
    "The monitoring flagship: one (signal, value) scorecard rolling "
    "up six registered signal families — sustained ingest drift "
    "(CUSUM alarm days), single-day seasonal outliers (3-MAD days), "
    "exact duplication rate, out-of-vocabulary rate, distribution "
    "drift (PSI total), and labeling-heuristic agreement (kappa). "
    "Composition IS the correctness story: the Spark side calls the "
    "registered query callables and aggregates their outputs; the "
    "oracle CTE-wraps the same queries' proven SQL twins — scorecard "
    "and signals cannot drift apart. Every input is already "
    "grain-reduced (day/class/lang grain), so the scorecard adds six "
    "tiny aggregates and one union to whatever the signals cost.",
)
def e18_corpus_health_scorecard(spark, sf_dir):
    from mcyj_datapipeline_spark.registry import _REGISTRY as R

    def q(name):
        return R[name][0](spark, sf_dir)

    def one(name, col):
        return q(name).agg(col.alias("value")).select(
            F.lit(name_map[name]).alias("signal"), "value"
        )

    from mcyj_datapipeline_spark.functions.numerics import stable6 as stable
    name_map = {
        "ev_cusum_changepoint": "cusum_alarm_days",
        "ts5_dow_baseline_anomaly": "dow_anomaly_days",
        "dedup_exact_hash": "exact_dup_rate",
        "text_vocab_oov_rate": "oov_rate",
        "ml_psi_drift": "psi_total",
        "dq7_cohens_kappa": "rater_kappa",
    }
    parts = [
        one(
            "ev_cusum_changepoint",
            F.sum(F.when(F.col("alarm"), 1).otherwise(0)).cast("double"),
        ),
        one(
            "ts5_dow_baseline_anomaly",
            F.sum(F.when(F.col("anomaly"), 1).otherwise(0)).cast("double"),
        ),
        one(
            "dedup_exact_hash",
            stable(
                (F.sum("n_copies") - F.count(F.lit(1))).cast("double")
                / F.sum("n_copies")
            ),
        ),
        one(
            "text_vocab_oov_rate",
            stable(F.sum("n_oov").cast("double") / F.sum("n_tokens")),
        ),
        one("ml_psi_drift", F.max("psi_total")),
        one("dq7_cohens_kappa", F.max("kappa")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("signal")

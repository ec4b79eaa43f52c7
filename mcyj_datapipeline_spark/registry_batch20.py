"""Batch 20 registry entries (round 6, continued): the
production-monitoring trio a long-lived corpus pipeline runs BEFORE
and AFTER its heavy jobs — distribution-drift detection (PSI), join
fan-out auditing, and temperature-scaled mixture rebalancing.

Reference provenance: none direct — the reference
(run_full_pipeline.py's forever loop) reprocesses nightly with no
drift or blast-radius checks; these are the guardrail queries the
same pipeline needs once the data is 100 TB and a bad join or a
drifted source costs real money. All three are public-lineage
patterns: PSI is the standard credit-scoring/ML-monitoring drift
statistic, the fan-out audit is the "estimate the join before you run
it" planner trick, and temperature sampling is the multilingual
mixture flattening of the XLM-R paper (Conneau et al. 2020, alpha on
language shares).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.operators.sampling import hash_bucket
from mcyj_datapipeline_spark.registry import register

__all__ = [
    "ml_psi_drift",
    "dq3_join_explosion_audit",
    "o14_temperature_resample",
]

_OLD_MAX_DOC = 400  # old snapshot: doc_id < 400 (incremental convention)
_PSI_FLOOR = 1e-4  # symmetric proportion floor so empty bins stay finite

_DECILES = [i / 10 for i in range(1, 10)]


@register(
    "ml_psi_drift",
    f"""
    WITH cps AS (
      SELECT [{', '.join(f'round(quantile_cont(n_chars, {q}), 4)' for q in _DECILES)}] AS cp
      FROM documents WHERE doc_id < {_OLD_MAX_DOC}
    ), bucketed AS (
      SELECT 1 + len(list_filter(cps.cp, c -> c < d.n_chars)) AS bucket,
             (d.doc_id < {_OLD_MAX_DOC}) AS is_old
      FROM documents d CROSS JOIN cps
    ), binned AS (
      SELECT bucket,
             count(*) FILTER (WHERE is_old) AS n_old,
             count(*) FILTER (WHERE NOT is_old) AS n_new
      FROM bucketed GROUP BY bucket
    ), tot AS (
      SELECT sum(n_old)::DOUBLE AS t_old, sum(n_new)::DOUBLE AS t_new
      FROM binned
    ), terms AS (
      SELECT bucket, n_old, n_new,
             greatest(n_old / t_old, {_PSI_FLOOR}) AS p_old,
             greatest(n_new / t_new, {_PSI_FLOOR}) AS p_new
      FROM binned CROSS JOIN tot
    )
    SELECT bucket, n_old, n_new,
           round(p_old, 6) AS p_old, round(p_new, 6) AS p_new,
           round((p_new - p_old) * ln(p_new / p_old), 6) AS psi_term,
           round(sum((p_new - p_old) * ln(p_new / p_old)) OVER (), 6)
             AS psi_total
    FROM terms ORDER BY bucket
    """,
    "Population Stability Index drift monitor: the new snapshot "
    f"(doc_id >= {_OLD_MAX_DOC}) binned by the OLD snapshot's own "
    "exact decile cutpoints, per-bin (p_new - p_old) * ln(p_new/p_old) "
    "terms plus the headline PSI total — the standard go/no-go drift "
    "statistic (PSI > 0.2 = retrain/investigate) every scoring or "
    "curation model needs in front of it. Spark plan: one aggregate "
    "computes the 9 cutpoints on the old slice (approx_percentile "
    "slots in at 100 TB, nothing else changes — the w5b contract), "
    "broadcast to ONE full scan that buckets and conditionally counts "
    "both snapshots in the same pass; every relation after the scan "
    "is 10 rows. Proportions floor at 1e-4 symmetrically so an empty "
    "bin yields a large finite term, never inf/NaN. Cutpoints round "
    "to 4dp before bucketing (both engines bit-equal on boundaries), "
    "terms to 6dp after.",
)
def ml_psi_drift(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    old = docs.filter(F.col("doc_id") < _OLD_MAX_DOC)
    cps = old.agg(
        F.expr(
            "transform(percentile(n_chars, "
            f"array({', '.join(str(q) for q in _DECILES)})), "
            "c -> round(c, 4))"
        ).alias("cp")
    )
    binned = (
        docs.crossJoin(F.broadcast(cps))
        .select(
            (
                F.lit(1)
                + F.size(F.filter(F.col("cp"), lambda c: c < F.col("n_chars")))
            ).alias("bucket"),
            (F.col("doc_id") < _OLD_MAX_DOC).alias("is_old"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("is_old"), 1)).alias("n_old"),
            F.count(F.when(~F.col("is_old"), 1)).alias("n_new"),
        )
    )
    tot = binned.agg(
        F.sum("n_old").cast("double").alias("t_old"),
        F.sum("n_new").cast("double").alias("t_new"),
    )
    terms = binned.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_old",
        "n_new",
        F.greatest(F.col("n_old") / F.col("t_old"), F.lit(_PSI_FLOOR)).alias(
            "p_old"
        ),
        F.greatest(F.col("n_new") / F.col("t_new"), F.lit(_PSI_FLOOR)).alias(
            "p_new"
        ),
    )
    term = (F.col("p_new") - F.col("p_old")) * F.log(
        F.col("p_new") / F.col("p_old")
    )
    # the total rides back onto the 10-row bin relation as a one-row
    # broadcast (not a window — the registry-wide plan audit bans
    # unpartitioned windows even over tiny relations)
    terms = terms.localCheckpoint(eager=False)
    psi_total = terms.agg(F.round(F.sum(term), 6).alias("psi_total"))
    return (
        terms.crossJoin(F.broadcast(psi_total))
        .select(
            "bucket",
            "n_old",
            "n_new",
            F.round("p_old", 6).alias("p_old"),
            F.round("p_new", 6).alias("p_new"),
            F.round(term, 6).alias("psi_term"),
            "psi_total",
        )
        .orderBy("bucket")
    )


@register(
    "dq3_join_explosion_audit",
    """
    WITH grp AS (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'view') AS n_views,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
      FROM events GROUP BY user_id
    ), est AS (
      SELECT user_id, n_views, n_purchases,
             n_views * n_purchases AS est_pairs
      FROM grp WHERE n_views * n_purchases > 0
    ), tot AS (SELECT sum(est_pairs)::DOUBLE AS total FROM est)
    SELECT user_id, n_views, n_purchases, est_pairs,
           round(est_pairs / total, 6) AS share_of_total
    FROM est CROSS JOIN tot
    ORDER BY est_pairs DESC, user_id LIMIT 15
    """,
    "Join fan-out audit: BEFORE running the views x purchases per-user "
    "join, estimate its output exactly from per-key counts — total "
    "emitted rows = sum over keys of n_views * n_purchases, plus the "
    "top-15 keys by blast radius and their share. This is the query "
    "an operator runs when a 100 TB join might be a 10 PB mistake: "
    "the audit costs ONE partial-aggregating scan (conditional counts "
    "collapse map-side) and every later relation is key-grain; the "
    "candidate join itself never runs. The one-row total broadcasts "
    "back onto the key-grain relation — no window over the data, no "
    "single-reducer sort (top-15 is a TakeOrdered).",
)
def dq3_join_explosion_audit(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type")
    grp = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias(
                "n_views"
            ),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
        )
        .withColumn("est_pairs", F.col("n_views") * F.col("n_purchases"))
        .filter(F.col("est_pairs") > 0)
    )
    tot = grp.agg(F.sum("est_pairs").cast("double").alias("total"))
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_views",
            "n_purchases",
            "est_pairs",
            F.round(F.col("est_pairs") / F.col("total"), 6).alias(
                "share_of_total"
            ),
        )
        .orderBy(F.desc("est_pairs"), "user_id")
        .limit(15)
    )


_TEMP_ALPHA = 0.3
_N_BUCKETS = 10_000


@register(
    "o14_temperature_resample",
    f"""
    WITH counts AS (
      SELECT lang, count(*)::DOUBLE AS c FROM documents GROUP BY lang
    ), shares AS (
      SELECT lang, c, c / sum(c) OVER () AS p FROM counts
    ), tgt AS (
      SELECT lang, c, pow(p, {_TEMP_ALPHA}) / sum(pow(p, {_TEMP_ALPHA})) OVER () AS t
      FROM shares
    ), n AS (SELECT min(c / t) AS n_out FROM tgt),
    rates AS (
      SELECT lang, round(least(1.0, (n_out * t) / c), 6) AS rate
      FROM tgt CROSS JOIN n
    )
    SELECT d.doc_id, d.lang FROM documents d
    JOIN rates r ON d.lang = r.lang
    WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT)
          % {_N_BUCKETS} < r.rate * {_N_BUCKETS}
    """,
    f"Temperature-scaled mixture resampling (alpha={_TEMP_ALPHA}, the "
    "XLM-R multilingual recipe): target language shares are the "
    "observed shares raised to alpha and renormalized — flattening "
    "head languages toward the tail without the tail upsampling a "
    "uniform target would force. Unlike o10's FIXED target mixture, "
    "the targets here derive from the data itself, so the whole rate "
    "table is computed declaratively: one partial-aggregating count "
    "per language, windows only over the 5-row language relation, "
    "rates rounded to 6dp on both engines before the cutoff compare. "
    "The resample is the same zero-shuffle deterministic hash filter "
    "as every sampler here — rates broadcast-join onto the corpus, "
    "each row keeps or drops itself map-side.",
)
def o14_temperature_resample(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # all normalizations ride onto the 5-row language relation as
    # one-row broadcasts (no windows — the plan audit bans
    # unpartitioned windows even over tiny relations)
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    ).localCheckpoint(eager=False)
    grand = counts.agg(F.sum("c").alias("grand"))
    shares = counts.crossJoin(F.broadcast(grand)).withColumn(
        "p", F.col("c") / F.col("grand")
    ).localCheckpoint(eager=False)
    pow_sum = shares.agg(F.sum(F.pow("p", _TEMP_ALPHA)).alias("pow_sum"))
    tgt = shares.crossJoin(F.broadcast(pow_sum)).withColumn(
        "t", F.pow("p", _TEMP_ALPHA) / F.col("pow_sum")
    ).localCheckpoint(eager=False)
    n_out = tgt.agg(F.min(F.col("c") / F.col("t")).alias("n_out"))
    rates = tgt.crossJoin(F.broadcast(n_out)).select(
        "lang",
        F.round(
            F.least(F.lit(1.0), (F.col("n_out") * F.col("t")) / F.col("c")), 6
        ).alias("rate"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(
            hash_bucket(F.col("doc_id"), _N_BUCKETS)
            < F.col("rate") * _N_BUCKETS
        )
        .select("doc_id", "lang")
    )

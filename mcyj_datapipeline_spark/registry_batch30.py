"""Batch 30 registry entries (round 6, continued): RFM customer
segmentation and the Pareto concentration (80/20) report — the two
canonical customer-analytics rollups over the same orders data.

Reference provenance: none direct — classic marketing-analytics
shapes, both expressed with the engine's broadcast-cutpoint machinery
(w5b's pattern) so no window ever runs over the data: quintile/decile
boundaries come from one exact-percentile aggregate (approx_percentile
slots in at scale), scores are pure map-side comparisons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.io import read_table
from mcyj_datapipeline_spark.registry import register

__all__ = ["c3_rfm_segmentation", "c4_pareto_concentration"]


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_RFM_QS = [0.2, 0.4, 0.6, 0.8]


def _cp_sql(col: str) -> str:
    qs = ", ".join(
        f"round(quantile_cont({col}, {q}), 4)" for q in _RFM_QS
    )
    return f"[{qs}]"


@register(
    "c3_rfm_segmentation",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             epoch(max(o_orderdate)) / 86400.0 AS recency,
             count(*)::DOUBLE AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ), cps AS (
      SELECT {_cp_sql("recency")} AS rc,
             {_cp_sql("frequency")} AS fc,
             {_cp_sql("monetary")} AS mc
      FROM per_cust
    ), scored AS (
      SELECT p.o_custkey,
             1 + len(list_filter(cps.rc, c -> c < p.recency)) AS r,
             1 + len(list_filter(cps.fc, c -> c < p.frequency)) AS f,
             1 + len(list_filter(cps.mc, c -> c < p.monetary)) AS m,
             p.monetary
      FROM per_cust p CROSS JOIN cps
    )
    SELECT r::VARCHAR || f::VARCHAR || m::VARCHAR AS segment,
           count(*) AS n_customers,
           round(sum(monetary), 2) AS total_monetary
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    "RFM segmentation: per-customer recency (days of latest order) / "
    "frequency / monetary collapse to quintile scores via BROADCAST "
    "cutpoints (w5b's pattern: one exact-percentile aggregate over "
    "the customer-grain relation, rounded to 4dp so boundary doubles "
    "are bit-equal cross-engine; score = 1 + #cutpoints below) — no "
    "window ever touches data, so at 100 TB the only data-sized term "
    "is the one orders rollup and approx_percentile slots into the "
    "cutpoint aggregate unchanged. Output is the classic "
    "'555 = champions' segment table.",
)
def c3_rfm_segmentation(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            (
                F.max("o_orderdate").cast("timestamp").cast("long") / 86400.0
            ).alias("recency"),
            F.count(F.lit(1)).cast("double").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .localCheckpoint(eager=False)
    )

    def cp(col):
        return F.expr(
            f"transform(percentile({col}, array(0.2,0.4,0.6,0.8)), "
            "c -> round(c, 4))"
        ).alias(f"{col}_cp")

    cps = per_cust.agg(cp("recency"), cp("frequency"), cp("monetary"))

    def score(col):
        return F.lit(1) + F.size(
            F.filter(F.col(f"{col}_cp"), lambda c: c < F.col(col))
        )

    scored = per_cust.crossJoin(F.broadcast(cps)).select(
        F.concat(
            score("recency").cast("string"),
            score("frequency").cast("string"),
            score("monetary").cast("string"),
        ).alias("segment"),
        "monetary",
    )
    return (
        scored.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .orderBy("segment")
    )


_PARETO_QS = [i / 10 for i in range(1, 10)]


@register(
    "c4_pareto_concentration",
    f"""
    WITH per_cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders GROUP BY o_custkey
    ), cps AS (
      SELECT [{", ".join(f"round(quantile_cont(spend, {q}), 4)" for q in _PARETO_QS)}]
               AS cp
      FROM per_cust
    ), binned AS (
      SELECT 1 + len(list_filter(cps.cp, c -> c < p.spend)) AS decile,
             p.spend
      FROM per_cust p CROSS JOIN cps
    ), d AS (
      SELECT decile, count(*) AS n_customers,
             round(sum(spend), 2) AS spend
      FROM binned GROUP BY decile
    ), tot AS (SELECT sum(spend) AS t FROM d)
    SELECT d.decile, d.n_customers, d.spend,
           round(d.spend / tot.t, 6) AS share,
           round((SELECT sum(d2.spend) FROM d d2
                  WHERE d2.decile >= d.decile) / tot.t, 6)
             AS cum_share_from_top
    FROM d CROSS JOIN tot ORDER BY d.decile
    """,
    "Pareto concentration (the 80/20 report): customers bucket into "
    "spend deciles via broadcast cutpoints, and each decile reports "
    "its revenue share plus the cumulative share of it-and-above — "
    "'the top decile drives X% of revenue', the concentration curve "
    "behind whale-risk and sampling decisions. The cumulative term "
    "is a triangular self-join ON THE 10-ROW decile relation (the "
    "w7 pattern), the total a one-row broadcast; after the one "
    "customer rollup nothing data-sized moves.",
)
def c4_pareto_concentration(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .localCheckpoint(eager=False)
    )
    cps = per_cust.agg(
        F.expr(
            "transform(percentile(spend, "
            f"array({', '.join(str(q) for q in _PARETO_QS)})), "
            "c -> round(c, 4))"
        ).alias("cp")
    )
    d = (
        per_cust.crossJoin(F.broadcast(cps))
        .select(
            (
                F.lit(1)
                + F.size(F.filter(F.col("cp"), lambda c: c < F.col("spend")))
            ).alias("decile"),
            "spend",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("spend"),
        )
        .localCheckpoint(eager=False)
    )
    tot = d.agg(F.sum("spend").alias("t"))
    hi = d.select(F.col("decile").alias("d2"), F.col("spend").alias("s2"))
    return (
        d.join(F.broadcast(hi), F.col("d2") >= F.col("decile"), "left")
        .groupBy("decile", "n_customers", "spend")
        .agg(F.sum("s2").alias("_cum_top"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "spend",
            F.round(F.col("spend") / F.col("t"), 6).alias("share"),
            F.round(F.col("_cum_top") / F.col("t"), 6).alias(
                "cum_share_from_top"
            ),
        )
        .orderBy("decile")
    )

"""Batch 37 semantic tests: ACF recompute + bounds, scorecard
consistency with its member signals. Value parity vs DuckDB runs in
test_oracle_parity.py."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_acf_recompute_and_bounds(spark):
    """ACF values sit in [-1, 1] and lag-1 matches a driver-side
    Pearson recompute over the same (x_t, x_{t-1}) pairs."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.registry_batch37 import ts6_autocorrelation

    rows = ts6_autocorrelation(spark, SF).collect()
    assert rows
    assert {r["lag"] for r in rows} == {1, 2, 7}
    for r in rows:
        if r["acf"] is not None:
            assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .count()
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["count"]))
    for et, pts in series.items():
        pts.sort()
        xs = [v for _, v in pts]
        pairs = [(xs[i - 1], xs[i]) for i in range(1, len(xs))]
        n = len(pairs)
        ma = sum(a for a, _ in pairs) / n
        mb = sum(b for _, b in pairs) / n
        cov = sum((a - ma) * (b - mb) for a, b in pairs) / (n - 1)
        va = sum((a - ma) ** 2 for a, _ in pairs) / (n - 1)
        vb = sum((b - mb) ** 2 for _, b in pairs) / (n - 1)
        expect = cov / math.sqrt(va * vb)
        got = next(
            r["acf"] for r in rows if r["event_type"] == et and r["lag"] == 1
        )
        assert abs(got - expect) < 1e-4, et


def test_scorecard_matches_member_signals(spark):
    """Each scorecard row equals the same aggregate computed directly
    from the member signal query — composition cannot drift."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.registry import _REGISTRY, load_all
    from mcyj_datapipeline_spark.registry_batch37 import (
        e18_corpus_health_scorecard,
    )

    load_all()  # raw _REGISTRY reads below need the full registry

    card = {
        r["signal"]: r["value"]
        for r in e18_corpus_health_scorecard(spark, SF).collect()
    }
    assert set(card) == {
        "cusum_alarm_days",
        "dow_anomaly_days",
        "exact_dup_rate",
        "oov_rate",
        "psi_total",
        "rater_kappa",
    }

    def run(name):
        return _REGISTRY[name][0](spark, SF)

    cusum = run("ev_cusum_changepoint").filter(F.col("alarm")).count()
    assert card["cusum_alarm_days"] == float(cusum)
    dow = run("ts5_dow_baseline_anomaly").filter(F.col("anomaly")).count()
    assert card["dow_anomaly_days"] == float(dow)
    dup = run("dedup_exact_hash").agg(
        F.sum("n_copies").alias("tot"), F.count(F.lit(1)).alias("uniq")
    ).collect()[0]
    assert (
        abs(card["exact_dup_rate"] - (dup["tot"] - dup["uniq"]) / dup["tot"])
        < 1e-5
    )
    oov = run("text_vocab_oov_rate").agg(
        F.sum("n_oov").alias("o"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert abs(card["oov_rate"] - oov["o"] / oov["t"]) < 1e-5
    psi = run("ml_psi_drift").agg(F.max("psi_total")).collect()[0][0]
    assert card["psi_total"] == psi
    kappa = run("dq7_cohens_kappa").collect()[0]["kappa"]
    assert card["rater_kappa"] == kappa
    assert 0.0 <= card["exact_dup_rate"] < 1.0
    assert 0.0 <= card["oov_rate"] < 1.0


def test_acf_degenerate_series_yields_null_not_crash(spark):
    """Constant or two-point series (zero variance) must yield NULL
    acf — not an ANSI DIVIDE_BY_ZERO crash — matching DuckDB corr;
    the try_divide(covar, sd*sd) spelling over pair-masked columns is
    what the registry query uses."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0), ("b", 1, 7.0)],
        "k string, t int, x double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("t")
    lagged = df.select("k", "x", F.lag("x", 1).over(w).alias("x1"))
    xp = F.when(F.col("x1").isNotNull(), F.col("x"))
    out = lagged.groupBy("k").agg(
        F.try_divide(
            F.covar_samp(xp, F.col("x1")),
            F.stddev_samp(xp) * F.stddev_samp("x1"),
        ).alias("acf")
    ).collect()
    got = {r["k"]: r["acf"] for r in out}
    assert got["a"] is None  # constant series: sd == 0 -> NULL
    assert got["b"] is None  # single point: no pairs -> NULL

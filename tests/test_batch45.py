"""Batch 45 semantic tests: LTV decay replay, grouped-mode tiebreak.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ltv_decay_replays_integer_arithmetic(spark):
    """Driver-side replay of the cents x fixed-weight arithmetic
    reproduces every user's LTV exactly; LTV never exceeds the
    undecayed purchase total and decays strictly below it for any
    user with a non-as-of-day purchase."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.registry_batch45 import (
        _LTV_HALFLIFE_DAYS,
        ev_ltv_decay,
    )

    rows = {r["user_id"]: r for r in ev_ltv_decay(spark, SF).collect()}
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"), "value")
        .collect()
    )
    asof = max(p["d"] for p in purchases + [])
    asof = (
        ev.agg(F.max(F.to_date("ts")).alias("m")).collect()[0]["m"]
    )
    acc: dict = {}
    for p in purchases:
        cents = round(p["value"] * 100)
        age = (asof - p["d"]).days
        w6 = round(0.5 ** (age / _LTV_HALFLIFE_DAYS) * 1e6)
        s, n = acc.get(p["user_id"], (0, 0))
        acc[p["user_id"]] = (s + cents * w6, n + 1)
    assert set(acc) == set(rows)
    for uid, (s, n) in acc.items():
        r = rows[uid]
        assert r["n_purchases"] == n
        assert abs(r["ltv"] - s / 1e8) < 1e-5, uid
        undecayed = sum(
            round(p["value"] * 100) for p in purchases if p["user_id"] == uid
        ) / 100.0
        assert r["ltv"] <= undecayed + 1e-6


def test_grouped_mode_tiebreak(spark):
    """The modal type per user equals a driver-side recompute with the
    count-desc / type-asc tiebreak."""
    from mcyj_datapipeline_spark.registry_batch45 import a26_grouped_mode

    rows = {
        r["user_id"]: (r["modal_type"], r["n_events"])
        for r in a26_grouped_mode(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    counts: dict = {}
    for e in ev:
        counts.setdefault(e["user_id"], {}).setdefault(e["event_type"], 0)
        counts[e["user_id"]][e["event_type"]] += 1
    assert set(rows) == set(counts)
    for uid, per_type in counts.items():
        best = sorted(per_type.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert rows[uid] == best, uid

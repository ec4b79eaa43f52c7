"""Batch 32 semantic tests: CUSUM recurrence replay, Flesch formula
recompute, kappa confusion-matrix recompute, approx-quantile bound.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def test_cusum_replays_the_recurrence(spark):
    """Replaying the published recurrence driver-side over one key's
    day-ordered counts reproduces sp/sm (to the 6dp output rounding);
    stats are non-negative and alarm matches the threshold rule."""
    from mcyj_datapipeline_spark.registry_batch32 import (
        _CUSUM_K_FRAC,
        ev_cusum_changepoint,
    )

    rows = ev_cusum_changepoint(spark, SF).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert r["sp"] >= 0.0 and r["sm"] >= 0.0
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) > 1
    for et, series in by_type.items():
        series.sort(key=lambda r: r["d"])
        mu = sum(r["x"] for r in series) / len(series)
        assert abs(series[0]["mu"] - mu) < 1e-6
        k = _CUSUM_K_FRAC * mu
        sp = sm = 0.0
        for r in series:
            sp = max(0.0, sp + ((r["x"] - mu) - k))
            sm = max(0.0, sm + ((mu - r["x"]) - k))
            assert abs(r["sp"] - sp) < 1e-5, (et, r["d"])
            assert abs(r["sm"] - sm) < 1e-5, (et, r["d"])
            assert r["alarm"] == (sp > mu or sm > mu), (et, r["d"])


def test_readability_formula_and_counter_sanity(spark):
    """Every word carries >= 1 syllable, every doc >= 1 sentence, and
    the flesch column is exactly the published formula over the three
    published counters."""
    from mcyj_datapipeline_spark.registry_batch32 import text_readability

    rows = text_readability(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_sentences"] >= 1
        assert r["n_syllables"] >= r["n_words"] >= 1
        expect = (
            206.835
            - 1.015 * (r["n_words"] / r["n_sentences"])
            - 84.6 * (r["n_syllables"] / r["n_words"])
        )
        assert abs(r["flesch"] - expect) < 1e-5, r


def test_kappa_matches_driver_side_confusion_matrix(spark):
    """Recomputing the two raters and the kappa arithmetic from raw
    text driver-side reproduces n/po/pe/kappa; kappa is in [-1, 1]."""
    from mcyj_datapipeline_spark.registry_batch32 import (
        _KAPPA_CHARS,
        _KAPPA_WORDS,
        dq7_cohens_kappa,
    )

    row = dq7_cohens_kappa(spark, SF).collect()[0]
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text", "n_chars")
        .collect()
    )
    n11 = n10 = n01 = n00 = 0
    for d in docs:
        a = d["n_chars"] >= _KAPPA_CHARS
        b = (
            len([w for w in re.split(r"\s+", d["text"] or "") if w])
            >= _KAPPA_WORDS
        )
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    assert row["n_docs"] == n
    po = (n11 + n00) / n
    pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
        (n10 + n00) / n
    )
    assert abs(row["po"] - po) < 1e-5
    assert abs(row["pe"] - pe) < 1e-5
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 1e-5
    assert -1.0 <= row["kappa"] <= 1.0
    assert min(n11, n10, n01, n00) > 0, "all four cells should populate"


def test_approx_quantile_contract_holds_and_is_tight(spark):
    """All three quantiles sit inside the published n/accuracy rank
    bound, and each sketch output is an actually-observed value (the
    percentile_approx contract, not an interpolation)."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.registry_batch32 import (
        _AQ_ACCURACY,
        _AQ_QS,
        a24_approx_quantile_contract,
    )

    rows = a24_approx_quantile_contract(spark, SF).collect()
    assert [r["q"] for r in rows] == sorted(_AQ_QS)
    assert all(r["within_bound"] for r in rows)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    observed = {
        r["l_extendedprice"]
        for r in li.select("l_extendedprice").distinct().collect()
    }
    vs = li.agg(
        F.percentile_approx(
            "l_extendedprice", list(_AQ_QS), _AQ_ACCURACY
        ).alias("vs")
    ).collect()[0]["vs"]
    assert all(v in observed for v in vs)

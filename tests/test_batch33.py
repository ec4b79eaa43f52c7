"""Batch 33 semantic tests: Jaro-Winkler kernel properties, seasonal
MAD-anomaly contract, calibration accounting. Value parity vs DuckDB
runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_jaro_winkler_kernel_textbook_values():
    """The shared Python kernel reproduces the published textbook
    values (MARTHA/MARHTA etc.) and the metric axioms."""
    from mcyj_datapipeline_spark.operators.linkage import jaro_winkler_py

    assert abs(jaro_winkler_py("martha", "marhta") - 0.9611111111) < 1e-9
    assert abs(jaro_winkler_py("dixon", "dicksonx") - 0.8133333333) < 1e-9
    assert abs(jaro_winkler_py("duane", "dwayne") - 0.84) < 1e-9
    assert jaro_winkler_py("same", "same") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0
    # symmetry and the <= 0.7 no-boost branch
    assert jaro_winkler_py("order", "sort") == jaro_winkler_py(
        "sort", "order"
    )
    assert abs(jaro_winkler_py("slow", "sort") - 0.6666666667) < 1e-9


def test_fuzzy_vocab_pairs_blocking_and_threshold(spark):
    """Every returned pair obeys the block predicate (shared first
    char, length band, w1 < w2) and the threshold; pairs the block
    admits but the threshold rejects are absent."""
    from mcyj_datapipeline_spark.registry_batch33 import (
        _JW_LEN_DIFF,
        _JW_MIN,
        er_jaro_winkler_vocab,
    )

    rows = er_jaro_winkler_vocab(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["w1"] < r["w2"]
        assert r["w1"][0] == r["w2"][0]
        assert abs(len(r["w1"]) - len(r["w2"])) <= _JW_LEN_DIFF
        assert r["jw"] >= _JW_MIN - 1e-6
    got = {(r["w1"], r["w2"]) for r in rows}
    # known sub-threshold blocked pair must not leak through
    assert ("small", "spark") not in got  # jw exactly 0.6 < 0.605
    assert ("scan", "stream") in got  # jw 0.6111 >= 0.605


def test_dow_anomaly_robust_stats_contract(spark):
    """med/mad are exact .0/.5 values on integer counts; within each
    (type, dow) cell at most half the days can exceed the MAD (median
    property); anomaly implies mad > 0 and deviation > 3*mad."""
    from mcyj_datapipeline_spark.registry_batch33 import (
        ts5_dow_baseline_anomaly,
    )

    rows = ts5_dow_baseline_anomaly(spark, SF).collect()
    assert rows
    cells: dict = {}
    for r in rows:
        assert (r["med"] * 2) == int(r["med"] * 2)  # .0/.5 exactness
        assert (r["mad"] * 2) == int(r["mad"] * 2)
        assert 0 <= r["dow"] <= 6
        if r["anomaly"]:
            assert r["mad"] > 0
            assert abs(r["x"] - r["med"]) > 3 * r["mad"]
        cells.setdefault((r["event_type"], r["dow"]), []).append(r)
    for (et, dow), grp in cells.items():
        xs = sorted(g["x"] for g in grp)
        n = len(xs)
        lo = (xs[(n - 1) // 2] + xs[n // 2]) / 2
        assert grp[0]["med"] == lo, (et, dow)
        # median property: at least half the days sit at or below med
        assert sum(1 for g in grp if g["x"] <= g["med"]) * 2 >= n


def test_calibration_bins_account_for_corpus(spark):
    """Bin sizes sum to the corpus, rates are in [0,1], the global
    Brier recomposed from per-bin contributions matches a driver-side
    recompute, and avg_quality is inside its bin's range."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.registry_batch33 import ml_calibration_bins

    rows = ml_calibration_bins(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert 0.0 <= r["avg_quality"] <= 1.0
        if r["bin"] < 9:
            assert r["bin"] / 10 <= r["avg_quality"] < (r["bin"] + 1) / 10
    # recompose global Brier from bin contributions
    global_brier = sum(r["brier"] * r["n_docs"] for r in rows) / n_docs
    pairs = docs.select(
        TA.quality_score(F.col("text")).alias("q"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    ).collect()
    q6s = [(round(p["q"] * 1e6), p["label"]) for p in pairs]
    expect = sum((q - lab * 1000000) ** 2 for q, lab in q6s) / (
        1e12 * n_docs
    )
    assert abs(global_brier - expect) < 1e-4

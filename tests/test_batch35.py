"""Batch 35 semantic tests: k-core fixpoint + degree invariant,
Heaps-curve monotone accounting, Zipf fit recompute. Value parity vs
DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _copurchase_edges(spark):
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l1 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    l2 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    return (
        l1.join(l2, "k").filter(F.col("a") < F.col("b")).select("a", "b")
    )


def test_kcore_fixpoint_and_degree_invariant(spark):
    """The fixed 12 rounds reach the peel fixpoint (one more round
    returns the identical set), and every member has >= k neighbors
    INSIDE the core — the defining k-core property."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators.graph import kcore_nodes
    from mcyj_datapipeline_spark.registry_batch35 import (
        _KCORE_K,
        _KCORE_ROUNDS,
    )

    edges = _copurchase_edges(spark)
    core = {r["node"] for r in kcore_nodes(edges, _KCORE_K, _KCORE_ROUNDS).collect()}
    again = {
        r["node"]
        for r in kcore_nodes(edges, _KCORE_K, _KCORE_ROUNDS + 1).collect()
    }
    assert core == again, "peel had not converged within the fixed rounds"
    assert core, "k-core should be nonempty at this k"
    all_edges = edges.collect()
    inside: dict = {}
    for e in all_edges:
        if e["a"] in core and e["b"] in core:
            inside[e["a"]] = inside.get(e["a"], 0) + 1
            inside[e["b"]] = inside.get(e["b"], 0) + 1
    for node in core:
        assert inside.get(node, 0) >= _KCORE_K, node
    # and it actually peeled something
    n_nodes = (
        edges.select(F.col("a").alias("n"))
        .union(edges.select(F.col("b").alias("n")))
        .distinct()
        .count()
    )
    assert len(core) < n_nodes


def test_heaps_curve_monotone_and_totals(spark):
    """Both cumulative series are strictly monotone non-decreasing,
    the final cum_vocab equals the corpus vocabulary size, and the
    final cum_tokens equals the corpus token count."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.registry_batch35 import text_heaps_curve

    rows = sorted(
        text_heaps_curve(spark, SF).collect(), key=lambda r: r["bucket"]
    )
    assert len(rows) > 2
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_tokens"] > prev["cum_tokens"]
        assert cur["cum_vocab"] >= prev["cum_vocab"]
    toks = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.explode(TA.tokens(F.col("text"))).alias("term")
    )
    assert rows[-1]["cum_tokens"] == toks.count()
    assert rows[-1]["cum_vocab"] == toks.distinct().count()


def test_zipf_fit_recompute(spark):
    """Driver-side least-squares over the same (rank, freq) pairs
    reproduces slope/intercept/corr; slope is negative (frequency
    decays with rank)."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.registry_batch35 import text_zipf_fit

    row = text_zipf_fit(spark, SF).collect()[0]
    tf = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(TA.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .count()
        .collect()
    )
    ordered = sorted(tf, key=lambda r: (-r["count"], r["term"]))
    xs = [math.log(i + 1) for i in range(len(ordered))]
    ys = [math.log(r["count"]) for r in ordered]
    n = len(xs)
    assert row["n_terms"] == n
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * sx / n
    assert abs(row["zipf_slope"] - slope) < 1e-4
    assert abs(row["zipf_intercept"] - intercept) < 1e-4
    assert row["zipf_slope"] < 0
    assert -1.0 <= row["loglog_corr"] < 0

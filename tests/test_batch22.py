"""Batch 22 semantic tests: the IVM identity against a direct
recompute, corrupt-record raw-line preservation, and k-anonymity
accounting. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def test_i2_incremental_equals_direct_recompute(spark):
    """The maintained view must equal a from-scratch recompute of
    snapshot B's rollup — the semi-naive IVM identity, checked inside
    Spark (the oracle checks it cross-engine)."""
    from mcyj_datapipeline_spark.operators.hashing import hash60
    from mcyj_datapipeline_spark.registry_batch22 import (
        i2_incremental_join_maintenance,
    )
    from mcyj_datapipeline_spark.io import read_table

    inc = {
        r["nation"]: (r["n_orders"], r["revenue"])
        for r in i2_incremental_join_maintenance(spark, SF).collect()
    }

    orders = read_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    bucket = hash60(F.col("o_orderkey").cast("string")) % 10
    b = (
        orders.filter(bucket != 0)
        .select(
            "o_custkey",
            F.when(bucket == 1, F.floor((cents * 11 + 5) / 10).cast("bigint"))
            .otherwise(cents)
            .alias("cents"),
        )
        .union(
            orders.filter(bucket == 2).select(
                "o_custkey", (cents + 100).alias("cents")
            )
        )
    )
    cust = read_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, SF, "nation").select("n_nationkey", "n_name")
    direct = {
        r["nation"]: (r["n_orders"], r["revenue"])
        for r in (
            b.join(cust, b["o_custkey"] == cust["c_custkey"])
            .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            )
            .collect()
        )
    }
    assert inc == direct


def test_s15_quarantine_preserves_raw_lines(spark):
    """Quarantined rows must carry the raw (truncated) line for
    replay, parse no fields, and count exactly the planted corrupt
    lines; clean rows must parse all fields."""
    from mcyj_datapipeline_spark.registry_batch22 import (
        _S15_CORRUPT_MOD,
        _s15_scratch,
        s15_corrupt_record_quarantine,
    )

    rows = {r["lang"]: r for r in s15_corrupt_record_quarantine(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_corrupt = docs.filter(
        F.col("doc_id") % _S15_CORRUPT_MOD == 3
    ).count()
    assert rows["(quarantined)"]["n_rows"] == n_corrupt
    assert rows["(quarantined)"]["sum_chars"] == 0
    assert sum(r["n_rows"] for r in rows.values()) == docs.count()

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(_s15_scratch())
        # Spark disallows queries touching ONLY the corrupt-record
        # column on a raw file scan; cache materializes the parse so
        # the quarantine-only filters below are legal (per Spark docs)
        .cache()
    )
    bad = back.filter(F.col("_corrupt").isNotNull())
    assert bad.count() == n_corrupt
    sample = bad.limit(5).collect()
    for r in sample:
        assert r["_corrupt"].startswith('{"doc_id":')
        assert r["doc_id"] is None and r["lang"] is None


def test_dq4_ladder_accounts_every_row_and_meets_k(spark):
    """Every order is counted exactly once across the three rungs, and
    every PUBLISHED (non-suppressed) group meets k."""
    from mcyj_datapipeline_spark.registry_batch22 import (
        _K_ANON,
        dq4_k_anonymity_generalize,
    )

    rows = dq4_k_anonymity_generalize(spark, SF).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        if r["level"] in ("month", "year"):
            assert r["n"] >= _K_ANON, r
        else:
            assert r["level"] == "suppressed" and r["period"] == "*"
    # keys unique per rung
    keys = [(r["status"], r["priority"], r["period"], r["level"]) for r in rows]
    assert len(keys) == len(set(keys))

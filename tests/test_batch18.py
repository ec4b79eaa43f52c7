"""Batch 18 semantic/invariant tests: count-min overestimate theorem,
KMV estimator sanity, LSH tuning-report reconciliation with the pair
pipeline it tunes. Value parity vs DuckDB runs in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_any_term(spark):
    """The count-min theorem: est(t) >= true(t) for EVERY term, not
    just the reported top-10 — recompute the full estimate relation
    and assert the inequality over the whole vocabulary."""
    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.operators.hashing import hash60
    from mcyj_datapipeline_spark.registry_batch18 import (
        _CMS_DEPTH,
        _CMS_WIDTH,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    occ = (
        docs.select(F.explode(TA.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells = occ.select(
        "term",
        "c",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])).alias(
            "row_id"
        ),
    ).withColumn(
        "bucket",
        hash60(
            F.concat(F.col("row_id").cast("string"), F.lit(":"), F.col("term"))
        )
        % _CMS_WIDTH,
    )
    counters = cells.groupBy("row_id", "bucket").agg(F.sum("c").alias("total"))
    est = (
        cells.join(counters, ["row_id", "bucket"])
        .groupBy("term")
        .agg(F.min("total").alias("est"), F.first("c").alias("c"))
    )
    bad = est.filter(F.col("est") < F.col("c")).count()
    assert bad == 0
    assert est.count() == occ.count()


def test_kmv_estimates_within_sane_bounds(spark):
    from mcyj_datapipeline_spark.registry_batch18 import (
        _KMV_K,
        sk_kmv_jaccard,
    )

    [r] = sk_kmv_jaccard(spark, SF).collect()
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert 0.0 <= r["exact_jaccard"] <= 1.0
    assert r["k"] == _KMV_K
    if r["exact_union_distinct"] <= _KMV_K:
        # partially-filled sketch holds the whole union: EXACT
        assert r["abs_err"] == 0.0
        assert r["est_union_distinct"] == float(r["exact_union_distinct"])
    else:
        assert r["abs_err"] <= 0.25
        assert (
            0.5 * r["exact_union_distinct"]
            <= r["est_union_distinct"]
            <= 1.5 * r["exact_union_distinct"]
        )


def test_kmv_full_sketch_path_at_sf001(spark):
    """sf0.01 has 150 users > k=64, exercising the kth-minimum
    cardinality formula and the k-divisor Jaccard path."""
    from mcyj_datapipeline_spark.registry_batch18 import (
        _KMV_K,
        sk_kmv_jaccard,
    )

    [r] = sk_kmv_jaccard(spark, "/root/testdata/sf0.01").collect()
    assert r["exact_union_distinct"] > _KMV_K
    assert r["abs_err"] <= 0.25
    assert (
        0.5 * r["exact_union_distinct"]
        <= r["est_union_distinct"]
        <= 1.5 * r["exact_union_distinct"]
    )


def test_lsh_tuning_report_reconciles_with_pair_pipeline(spark):
    """Every band must cover every shingled doc (n_docs equal across
    bands and equal to the signature count), and the candidate-pair
    bill must upper-bound the distinct candidate pairs the real pair
    join would consider."""
    from mcyj_datapipeline_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
    )
    from mcyj_datapipeline_spark.registry_batch18 import (
        dedup_lsh_tuning_report,
    )

    rows = dedup_lsh_tuning_report(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = minhash_signatures(docs)
    n_sigs = sigs.count()
    assert [r["band"] for r in rows] == [0, 1, 2, 3]
    assert all(r["n_docs"] == n_sigs for r in rows)
    for r in rows:
        assert r["singleton_buckets"] <= r["n_buckets"]
        assert r["max_bucket"] >= 1
    bands = lsh_bands(sigs)
    a = bands.select(
        F.col("doc_id").alias("id_a"), "band", "band_key"
    )
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "band_key")
    distinct_cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert sum(r["candidate_pairs"] for r in rows) >= distinct_cand

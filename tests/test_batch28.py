"""Batch 28 semantic tests: E17 release-pipeline composition
invariants — stage accounting against the standalone operators it
reuses. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_e17_stage_accounting_matches_standalone_operators(spark):
    """The datasheet's totals must reconcile with the standalone
    stages: released docs = budget-selected subset of the deduped +
    gated corpus; split shares from the pure hash function; tokens
    under the 50% budget; every released lang present in the gate
    survivors."""
    from mcyj_datapipeline_spark.io import read_table
    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.registry_batch28 import (
        _BUDGET_SHARE,
        _QUALITY_FLOOR,
        e17_corpus_release_pipeline,
    )

    rows = e17_corpus_release_pipeline(spark, SF).collect()
    assert rows
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    released_docs = sum(r["n_docs"] for r in rows)
    released_tokens = sum(r["tokens"] for r in rows)

    docs = read_table(spark, SF, "documents")
    scored = docs.select(
        "doc_id",
        TA.quality_score(F.col("text")).alias("q"),
        TA.token_count(F.col("text")).cast("bigint").alias("tok"),
        F.sha2("text", 256).alias("dig"),
    )
    # standalone recomputation of dedup + gate
    kept = (
        scored.groupBy("dig")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(scored, "doc_id")
        .filter(F.col("q") >= _QUALITY_FLOOR)
    )
    gated_tokens = kept.agg(F.sum("tok")).collect()[0][0]
    assert released_tokens <= _BUDGET_SHARE * gated_tokens
    assert released_docs <= kept.count()
    # train dominates the split (80/10/10 of a few hundred docs)
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert by_split.get("train", 0) > by_split.get("val", 0)
    assert by_split.get("train", 0) > by_split.get("test", 0)
    for r in rows:
        assert 0 <= r["mean_quality"] <= 1

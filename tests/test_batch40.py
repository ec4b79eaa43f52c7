"""Batch 40 semantic tests: feature-hashing conservation and
determinism. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_feature_hashing_conserves_mass_and_is_stable(spark):
    """Per-doc tf mass equals the doc's token count (hashing never
    drops or double-counts a token), buckets stay in [0, D), and the
    same term always lands in the same bucket (replayed driver-side
    through the identical md5 construction)."""
    import hashlib

    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import text_analysis as TA
    from mcyj_datapipeline_spark.registry_batch40 import (
        _FH_DIM,
        ml_feature_hashing,
    )

    rows = ml_feature_hashing(spark, SF).collect()
    assert rows
    mass: dict = {}
    for r in rows:
        assert 0 <= r["bucket"] < _FH_DIM
        mass[r["doc_id"]] = mass.get(r["doc_id"], 0) + r["tf"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(TA.tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for doc_id, n in tok_counts.items():
        assert mass.get(doc_id, 0) == n, doc_id
    # determinism: replay one doc's buckets through the same md5 math
    sample = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    expect: dict = {}
    for term in [t for t in sample.split() if t]:
        h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
        b = abs(h) % _FH_DIM
        expect[b] = expect.get(b, 0) + 1
    got = {r["bucket"]: r["tf"] for r in rows if r["doc_id"] == 0}
    assert got == expect

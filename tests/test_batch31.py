"""Batch 31 semantic tests: hard-negative mining contract, boolean
retrieval membership, n-gram novelty accounting. Value parity vs
DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import re

SF = "/root/testdata/sf0.001"


def test_hard_negatives_contract(spark):
    """Every mined negative carries a DIFFERENT label than its anchor,
    sits under the cosine ceiling, and ranks are contiguous 1..n in
    descending-cosine order per anchor."""
    from mcyj_datapipeline_spark.registry_batch31 import (
        _HN_CEIL,
        _HN_K,
        sim_hard_negatives,
    )

    rows = sim_hard_negatives(spark, SF).collect()
    assert rows
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    by_anchor: dict = {}
    for r in rows:
        assert labels[r["negative_id"]] != labels[r["anchor_id"]], r
        assert r["cosine"] < _HN_CEIL
        assert 1 <= r["rank"] <= _HN_K
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, group in by_anchor.items():
        group.sort(key=lambda r: r["rank"])
        assert [g["rank"] for g in group] == list(range(1, len(group) + 1))
        cosines = [g["cosine"] for g in group]
        assert cosines == sorted(cosines, reverse=True), anchor


def test_boolean_retrieval_membership(spark):
    """Returned docs contain ALL must-terms and NONE of the must-not
    terms; every qualifying doc is returned (completeness checked by
    recomputing membership from raw text driver-side)."""
    from mcyj_datapipeline_spark.registry_batch31 import (
        _BOOL_MUST,
        _BOOL_MUST_NOT,
        text_boolean_retrieval,
    )

    got = {r["doc_id"] for r in text_boolean_retrieval(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    expected = set()
    for r in docs:
        toks = set(re.split(r"\s+", r["text"] or ""))
        if all(t in toks for t in _BOOL_MUST) and not any(
            t in toks for t in _BOOL_MUST_NOT
        ):
            expected.add(r["doc_id"])
    assert got == expected
    assert got, "fixture should contain at least one qualifying doc"


def test_ngram_novelty_accounting(spark):
    """novelty in [0,1]; n_novel <= n_shingles; the corpus-wide novel
    count equals the number of trigrams with document frequency 1."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import dedup as D
    from mcyj_datapipeline_spark.registry_batch31 import text_ngram_novelty

    rows = text_ngram_novelty(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert abs(r["novelty"] - r["n_novel"] / r["n_shingles"]) < 1e-5
    inv = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.explode(D.word_shingles(F.col("text"), 3)).alias("shingle"),
        )
    )
    df1 = (
        inv.groupBy("shingle")
        .count()
        .filter(F.col("count") == 1)
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == df1

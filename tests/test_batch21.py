"""Batch 21 semantic tests: greedy-prefix maximality of the token-
budget selection, and cluster-accounting invariants of the quality-
canonical rewrite. Value parity vs DuckDB runs in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _scored(spark):
    from mcyj_datapipeline_spark.operators import text_analysis as TA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "doc_id",
        TA.quality_score(F.col("text")).alias("quality"),
        TA.token_count(F.col("text")).cast("bigint").alias("tokens"),
    )


def test_budget_select_is_maximal_greedy_prefix(spark):
    """The kept set must (a) fit the budget, (b) be a PREFIX of the
    (quality DESC, doc_id) order — no excluded doc may outrank a kept
    one — and (c) be maximal: the next doc in that order would bust
    the budget."""
    from mcyj_datapipeline_spark.registry_batch21 import (
        _BUDGET_SHARE,
        quality_token_budget_select,
    )

    kept = quality_token_budget_select(spark, SF).collect()
    assert kept
    allrows = sorted(
        _scored(spark).collect(), key=lambda r: (-r["quality"], r["doc_id"])
    )
    budget = _BUDGET_SHARE * sum(r["tokens"] for r in allrows)
    kept_ids = {r["doc_id"] for r in kept}
    total_kept = sum(r["tokens"] for r in kept)
    assert total_kept <= budget
    # prefix property + maximality against the independently-sorted list
    prefix = []
    cum = 0
    for r in allrows:
        if cum + r["tokens"] > budget:
            break
        cum += r["tokens"]
        prefix.append(r["doc_id"])
    assert set(prefix) == kept_ids
    # cum_tokens reported by the query equals the running sum
    by_id = {r["doc_id"]: r for r in kept}
    run = 0
    for did in prefix:
        run += by_id[did]["tokens"]
        assert by_id[did]["cum_tokens"] == run


def test_quality_canonical_accounts_for_every_doc(spark):
    """Cluster accounting: each input doc belongs to exactly one
    cluster, so sum(n_members) == corpus size and one winner is kept
    per cluster; every winner's quality is the max over its cluster
    (cross-checked via the CC map + recomputed scores)."""
    from mcyj_datapipeline_spark.operators import dedup as D
    from mcyj_datapipeline_spark.registry_batch21 import (
        e16_quality_canonical_rewrite,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    kept = e16_quality_canonical_rewrite(spark, SF).collect()
    assert sum(r["n_members"] for r in kept) == n_docs
    assert len({r["doc_id"] for r in kept}) == len(kept)

    pairs = D.minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    cc = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(pairs, "id_a", "id_b").collect()
    }
    scores = {r["doc_id"]: r["quality"] for r in _scored(spark).collect()}
    best = {}
    for did, q in scores.items():
        cl = cc.get(did, did)
        cur = best.get(cl)
        if cur is None or (q, -did) > (cur[0], -cur[1]):
            best[cl] = (q, did)
    assert {r["doc_id"] for r in kept} == {d for _, d in best.values()}
    for r in kept:
        assert r["quality"] == scores[r["doc_id"]]

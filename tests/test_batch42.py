"""Batch 42 semantic tests: mutual-kNN reciprocity/symmetry, HLL
overlap algebra. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_mutual_knn_reciprocity_and_subset(spark):
    """Every returned pair is reciprocal (both directions rank <= k),
    canonical (a < b), and is a strict subset of the one-directional
    top-k relation (mutuality only removes, never adds)."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.operators import similarity as S
    from mcyj_datapipeline_spark.registry_batch42 import (
        _MKNN_COHORT,
        _MKNN_K,
        sim_mutual_knn,
    )

    rows = sim_mutual_knn(spark, SF).collect()
    assert rows
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < _MKNN_COHORT
    )
    # recompute the full one-directional top-k driver-side
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(u, v):
        du = sum(x * x for x in u) ** 0.5
        dv = sum(x * x for x in v) ** 0.5
        return round(sum(x * y for x, y in zip(u, v)) / (du * dv), 6)

    topk = {}
    for q, qv in vecs.items():
        scored = sorted(
            ((cos(qv, nv), -n) for n, nv in vecs.items() if n != q),
            reverse=True,
        )[:_MKNN_K]
        topk[q] = {-n for _, n in scored}
    for r in rows:
        a, b = r["id_a"], r["id_b"]
        assert a < b
        assert 1 <= r["rank_ab"] <= _MKNN_K
        assert 1 <= r["rank_ba"] <= _MKNN_K
        assert b in topk[a] and a in topk[b], (a, b)
    got = {(r["id_a"], r["id_b"]) for r in rows}
    expect = {
        (min(a, b), max(a, b))
        for a in topk
        for b in topk[a]
        if a in topk[b]
    }
    assert got == expect


def test_hll_overlap_contract_and_exact_counts(spark):
    """Exact counts match a driver-side recompute; the sketch
    inclusion-exclusion estimate passes its published bound."""
    from mcyj_datapipeline_spark.registry_batch42 import (
        sk_hll_audience_overlap,
    )

    row = sk_hll_audience_overlap(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    a = {e["user_id"] for e in ev if e["event_type"] == "click"}
    b = {e["user_id"] for e in ev if e["event_type"] == "purchase"}
    assert row["n_a_exact"] == len(a)
    assert row["n_b_exact"] == len(b)
    assert row["n_overlap_exact"] == len(a & b)
    assert row["within_bound"]


def test_boundary_overlap_pairs_are_real_seams(spark):
    """Every reported pair's tail gram really is the tail of one doc
    and the head of the other, recomputed from raw text (batch 43)."""
    import re

    from mcyj_datapipeline_spark.registry_batch43 import (
        _BOUNDARY_K,
        dedup_boundary_overlap,
    )

    rows = dedup_boundary_overlap(spark, SF).collect()
    assert rows
    texts = {
        r["doc_id"]: [
            w
            for w in re.split(r"\s+", r["text"] or "")
            if w
        ]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows:
        tail_ws = texts[r["tail_doc"]]
        head_ws = texts[r["head_doc"]]
        assert " ".join(tail_ws[-_BOUNDARY_K:]) == r["gram"]
        assert " ".join(head_ws[:_BOUNDARY_K]) == r["gram"]
        assert r["tail_doc"] != r["head_doc"]

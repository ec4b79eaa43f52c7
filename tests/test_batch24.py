"""Batch 24 semantic tests: TextRank vocabulary grounding + mass
conservation, and similar-docs consistency with the underlying pair
relation. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_textrank_ranks_are_grounded_and_mass_conserved(spark):
    """Full-vocabulary rank mass must stay ~1 (mirrored graph is
    stochastic), the top-25 must be sorted, and every keyword must
    come from a bigram that clears the count floor."""
    from mcyj_datapipeline_spark.operators.graph import pagerank
    from mcyj_datapipeline_spark.registry_batch24 import (
        _TR_MIN_COUNT,
        text_textrank_keywords,
    )

    top = text_textrank_keywords(spark, SF).collect()
    assert len(top) == 25
    ranks = [r["rank"] for r in top]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    ws = F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != "")
    toks = docs.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("a"),
                F.slice("ws", 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    big = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .filter(F.col("c") >= _TR_MIN_COUNT)
    )
    vocab = {
        r["w"]
        for r in big.select(F.col("a").alias("w"))
        .union(big.select(F.col("b")))
        .distinct()
        .collect()
    }
    for r in top:
        assert r["word"] in vocab, r

    edges = big.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "c"
    ).union(big.select("b", "a", "c"))
    full = pagerank(edges, iterations=3, damping=0.85, weight="c")
    total = full.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9, total


def test_similar_docs_rows_agree_with_pair_relation(spark):
    """Every (doc, similar, jaccard) row must exist in the symmetric
    closure of the exact pair relation, per-doc rows are <= k and
    sorted by (jaccard desc, id), and scores clear the threshold."""
    from mcyj_datapipeline_spark.operators import dedup as D
    from mcyj_datapipeline_spark.registry_batch24 import (
        _SIM_K,
        _SIM_THRESHOLD,
        text_similar_docs_topk,
    )

    rows = text_similar_docs_topk(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, threshold=_SIM_THRESHOLD
        ).collect()
    }
    sym = dict(base)
    sym.update({(b, a): j for (a, b), j in base.items()})

    per_doc: dict[int, list] = {}
    for r in rows:
        assert r["jaccard"] >= _SIM_THRESHOLD
        assert sym[(r["doc_id"], r["similar_id"])] == r["jaccard"]
        per_doc.setdefault(r["doc_id"], []).append(
            (-r["jaccard"], r["similar_id"])
        )
    for doc, lst in per_doc.items():
        assert len(lst) <= _SIM_K
        assert lst == sorted(lst), doc

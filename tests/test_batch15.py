"""Batch 15 semantic tests on crafted fixtures: association-rule
arithmetic and a-priori pruning, PMI ranking behavior, BPE encode
consistency with the trained merges, and new/returning accounting.
Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.basket import association_rules_pairs
from mcyj_datapipeline_spark.operators.text_analysis import (
    bpe_encode_vocab,
    bpe_top_merges,
    pmi_bigrams,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_association_rules_confidence_and_lift(spark):
    """4 baskets; {a,b} co-occur in 2, a in 3, b in 2:
    a->b conf=2/3 lift=(2/3)/(2/4)=4/3; b->a conf=1 lift=1/(3/4)=4/3."""
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"), (4, "d"),
    ]
    out = association_rules_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=1, min_pair_support=2,
    ).collect()
    got = {(r["antecedent"], r["consequent"]): r for r in out}
    assert set(got) == {("a", "b"), ("b", "a")}
    ab, ba = got[("a", "b")], got[("b", "a")]
    assert ab["pair_support"] == 2 and ba["pair_support"] == 2
    assert math.isclose(ab["confidence"], round(2 / 3, 6))
    assert math.isclose(ab["lift"], round((2 / 3) / (2 / 4), 6))
    assert ba["confidence"] == 1.0
    assert math.isclose(ba["lift"], round(1 / (3 / 4), 6))


def test_association_rules_apriori_prune_drops_rare_items(spark):
    """min_item_support=2 removes item 'x' (1 basket) before the pair
    join, so the {x,y} pair never forms even though it co-occurs."""
    rows = [(1, "x"), (1, "y"), (2, "y"), (3, "y")]
    out = association_rules_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=2, min_pair_support=1,
    ).collect()
    assert out == []


def test_association_rules_duplicate_lineitems_count_once(spark):
    """The same item twice in one basket is one (basket, item) fact —
    supports are basket counts, not row counts."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    out = association_rules_pairs(
        _baskets(spark, rows), "basket", "item",
        min_item_support=1, min_pair_support=2,
    ).collect()
    got = {(r["antecedent"], r["consequent"]): r["confidence"] for r in out}
    assert got[("a", "b")] == 1.0 and got[("b", "a")] == 1.0


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pmi_ranks_exclusive_pair_above_promiscuous(spark):
    """'p q' always co-occur exclusively; 'x y' co-occur but x and y
    also appear alone everywhere — PMI must rank 'p q' higher even
    though both bigrams have the same raw count."""
    texts = (["p q"] * 4) + (["x y"] * 4) + (["x z1 y z2"] * 8)
    out = pmi_bigrams(_docs(spark, texts), min_count=4, top_k=10).collect()
    pmis = {r["bigram"]: r["pmi"] for r in out}
    assert pmis["p q"] > pmis["x y"]


def test_pmi_floor_excludes_rare_bigrams(spark):
    texts = ["a b"] * 5 + ["c d"]
    out = pmi_bigrams(_docs(spark, texts), min_count=5, top_k=10).collect()
    assert [r["bigram"] for r in out] == ["a b"]


def test_bpe_encode_matches_trained_merges(spark):
    """Encoding is the training rewrite: every merged symbol in the
    encoded pieces must be either a single char or a learned merge
    result, and re-joining pieces must reproduce the word."""
    texts = ["banana banana bandana"] * 3
    docs = _docs(spark, texts)
    merges = {r["merged"] for r in bpe_top_merges(docs, k=3).collect()}
    enc = bpe_encode_vocab(docs, k=3).collect()
    assert {r["w"] for r in enc} == {"banana", "bandana"}
    for r in enc:
        pieces = r["pieces"].split(" ")
        assert "".join(pieces) == r["w"]
        assert r["n_pieces"] == len(pieces)
        for p in pieces:
            assert len(p) == 1 or p in merges, (r["w"], p, merges)


def test_bpe_encode_compresses_frequent_patterns(spark):
    """Three merge rounds on a corpus dominated by 'an' runs must
    shorten 'banana' below its character length."""
    docs = _docs(spark, ["banana banana banana anna"] * 5)
    enc = {r["w"]: r["n_pieces"] for r in bpe_encode_vocab(docs, k=3).collect()}
    assert enc["banana"] < len("banana")


def test_new_vs_returning_accounting(spark):
    """Every (user, day) active fact is counted exactly once as new or
    returning, and per-user 'new' happens exactly once."""
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-02"),
        (2, "2024-01-02"), (2, "2024-01-03"),
        (3, "2024-01-03"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ds string").select(
        "user_id", F.to_date("ds").alias("d")
    )
    active = df.distinct()
    first = active.groupBy("user_id").agg(F.min("d").alias("fd"))
    j = active.join(first, "user_id")
    out = (
        j.groupBy(F.col("d").alias("day"))
        .agg(
            F.count(F.when(F.col("d") == F.col("fd"), 1)).alias("n_new"),
            F.count(F.when(F.col("d") > F.col("fd"), 1)).alias("n_returning"),
        )
        .orderBy("day")
        .collect()
    )
    got = {str(r["day"]): (r["n_new"], r["n_returning"]) for r in out}
    assert got == {
        "2024-01-01": (1, 0),
        "2024-01-02": (1, 1),
        "2024-01-03": (1, 1),
    }
    assert sum(n for n, _ in got.values()) == 3  # one 'new' per user

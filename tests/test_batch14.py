"""Batch 14 semantic tests on crafted fixtures: label propagation
community structure, phrase-search adjacency semantics (overlaps,
repeated-term phrases), weighted-sample determinism and weight
monotonicity, centroid-pair degeneracy, and column-profile null
accounting. Value parity vs DuckDB runs in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import label_propagation
from mcyj_datapipeline_spark.operators.quality import column_profile
from mcyj_datapipeline_spark.operators.sampling import weighted_sample_topk
from mcyj_datapipeline_spark.operators.similarity import (
    label_centroid_cosine_pairs,
)
from mcyj_datapipeline_spark.operators.text_analysis import (
    phrase_match_counts,
)


def _mirrored(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


# ---------------------------------------------------------------- LPA


def test_lpa_two_cliques_converge_to_two_communities(spark):
    """Two 4-cliques joined by one bridge edge: after a few rounds each
    clique agrees on one label and the labels differ across cliques."""
    def clique(nodes):
        return [(a, b) for a in nodes for b in nodes if a < b]

    edges = _mirrored(spark, clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)])
    got = {r["node"]: r["label"] for r in label_propagation(edges, iterations=4).collect()}
    left = {got[n] for n in (0, 1, 2)}
    right = {got[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_lpa_deterministic_tie_break_to_smallest_label(spark):
    """A node whose neighbors' labels tie on votes adopts the SMALLEST
    label: star center with leaves 5 and 9 (one vote each) -> 5."""
    edges = _mirrored(spark, [(1, 5), (1, 9)])
    got = {r["node"]: r["label"] for r in label_propagation(edges, iterations=1).collect()}
    assert got[1] == 5
    # leaves see only the center: both adopt 1
    assert got[5] == 1 and got[9] == 1


def test_lpa_one_row_per_node_every_round(spark):
    edges = _mirrored(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)])
    out = label_propagation(edges, iterations=3)
    assert out.count() == out.select("node").distinct().count() == 5


# ------------------------------------------------------- phrase search


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_phrase_counts_multiple_and_overlapping_matches(spark):
    docs = _docs(
        spark,
        [
            "a hash join b hash join c",   # two matches at 1 and 4
            "hash hash join",              # one match at 1
            "join hash",                   # reversed: no match
            "no terms here",
        ],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match_counts(docs, ["hash", "join"]).collect()
    }
    assert got == {0: (2, 1), 1: (1, 1)}


def test_phrase_repeated_term_overlap(spark):
    """Phrase ['x','x'] over 'x x x x' matches at 0,1,2 — overlapping
    runs all count, like positional-index intersection should."""
    docs = _docs(spark, ["x x x x"])
    [r] = phrase_match_counts(docs, ["x", "x"]).collect()
    assert (r["n_matches"], r["first_pos"]) == (3, 0)


def test_phrase_three_terms(spark):
    docs = _docs(spark, ["p q r", "p q p q r", "p r q"])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match_counts(docs, ["p", "q", "r"]).collect()
    }
    assert got == {0: (1, 0), 1: (1, 2)}


# ------------------------------------------------------ weighted sample


def test_weighted_sample_is_partition_layout_invariant(spark):
    rows = [(i, float(1 + (i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, w double")
    a = weighted_sample_topk(df, "k", F.col("w"), 50).select("k").collect()
    b = weighted_sample_topk(
        df.repartition(17), "k", F.col("w"), 50
    ).select("k").collect()
    assert sorted(r["k"] for r in a) == sorted(r["k"] for r in b)


def test_weighted_sample_prefers_heavy_rows(spark):
    """1000 rows where ids 0-99 carry 100x the weight of the rest: the
    top-100 draw should be dominated by heavy rows (A-ES property)."""
    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, w double")
    picked = [r["k"] for r in weighted_sample_topk(df, "k", F.col("w"), 100).collect()]
    heavy = sum(1 for k in picked if k < 100)
    assert heavy >= 60  # binomial-ish: heavy mass is 10000 vs 900


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0)], "k long, w double"
    )
    got = [r["k"] for r in weighted_sample_topk(df, "k", F.col("w"), 10).collect()]
    assert got == [1]


# ------------------------------------------------------ centroid pairs


def test_centroid_pairs_identical_labels_cosine_one(spark):
    """Two labels with identical member vectors -> centroid cosine 1;
    orthogonal third label -> cosine 0 against both."""
    rows = [
        (0, [1.0, 0.0]), (0, [3.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [0.0, 7.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in label_centroid_cosine_pairs(df).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0


# ------------------------------------------------------ column profile


def test_column_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
    )
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in column_profile(df, ["id", "s"], numeric_cols=["id"]).collect()
    }
    assert got[("id", "completeness")] == 1.0
    assert got[("s", "completeness")] == 0.75
    assert got[("s", "distinct_count")] == 2.0
    assert got[("id", "distinct_count")] == 4.0
    assert got[("id", "min")] == 1.0
    assert got[("id", "max")] == 4.0
    assert got[("id", "mean")] == 2.5

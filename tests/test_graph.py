"""Graph analytics: PageRank and triangle census on hand-built graphs
with known closed-form answers, plus SNM blocking on crafted near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.dedup import (
    sorted_neighborhood_pairs,
)
from mcyj_datapipeline_spark.operators.graph import pagerank, triangle_stats


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_two_node_cycle_is_uniform(spark):
    """a<->b is symmetric: ranks must stay exactly 1/2 each round."""
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), iterations=3
        ).collect()
    }
    assert ranks == pytest.approx({"a": 0.5, "b": 0.5})


def test_pagerank_mirrored_star_sums_to_one_and_center_dominates(spark):
    """Undirected star a-{b,c,d}: stochastic (no dangling mass), so the
    ranks are a distribution, and the hub outranks every leaf."""
    pairs = []
    for leaf in "bcd":
        pairs += [("a", leaf), (leaf, "a")]
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), iterations=5).collect()
    }
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(ranks["a"] > ranks[leaf] for leaf in "bcd")
    assert ranks["b"] == pytest.approx(ranks["c"]) == pytest.approx(ranks["d"])


def test_pagerank_dangling_node_keeps_teleport_share(spark):
    """b->a only: b has no in-edges, so after round 1 its rank is the
    bare teleport share (1-d)/N — the left-join-back path."""
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges(spark, [("b", "a")]), iterations=1, damping=0.85
        ).collect()
    }
    assert ranks["b"] == pytest.approx(0.15 / 2)
    assert ranks["a"] == pytest.approx(0.15 / 2 + 0.85 * 0.5)


def _und(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a string, b string"
    )


def test_triangle_census_k3(spark):
    row = triangle_stats(
        _und(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    ).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) == (3, 1, 1)


def test_triangle_census_square_has_no_triangles(spark):
    row = triangle_stats(
        _und(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    ).collect()[0]
    assert row["n_edges"] == 4
    assert row["n_triangles"] == 0


def test_triangle_census_k4(spark):
    """K4 has C(4,3)=4 triangles; orientation must count each once."""
    nodes = "abcd"
    pairs = [
        (nodes[i], nodes[j])
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    row = triangle_stats(_und(spark, pairs)).collect()[0]
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4


def test_snm_finds_adjacent_near_dups_only(spark):
    """Two near-identical texts pair up; a distinct text in the same
    block does not; a same-prefix text with a wildly different length
    is filtered by the ratio valve."""
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog", "en"),
            (2, "The quick brown fox jumps over the lazy dog!!", "en"),
            (3, "Completely different content about spark engines", "en"),
            (4, "The quick brown fox " + "padding " * 40, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            docs, block_col="lang", window=3, prefix_len=12
        ).collect()
    }
    assert pairs == {(1, 2)}


def test_snm_window_bound_limits_comparisons(spark):
    """Five identical-prefix docs, window=1: only adjacent pairs emit
    (4 pairs), never the full C(5,2)=10."""
    docs = spark.createDataFrame(
        [(i, f"shared prefix text body variant {i}", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    pairs = sorted_neighborhood_pairs(
        docs, block_col="lang", window=1, prefix_len=12
    ).collect()
    assert len(pairs) == 4


def test_snm_null_and_empty_text_never_pair(spark):
    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "   ", "en"), (3, None, "en"), (4, "", "en")],
        "doc_id long, text string, lang string",
    )
    assert (
        sorted_neighborhood_pairs(docs, block_col="lang").count() == 0
    )


def test_triangle_orientation_defuses_hub_wedges(spark):
    """Star K1,200: the hub has degree 200 but every edge orients
    leaf->hub (leaves have degree 1), so the oriented out-degree of
    every node is <= 1 and the wedge join produces ZERO rows — the
    property that keeps a skewed hub from exploding the self-join."""
    pairs = [("hub", f"leaf{i:03d}") for i in range(200)]
    row = triangle_stats(_und(spark, pairs)).collect()[0]
    assert row["n_edges"] == 200
    assert row["n_wedges"] == 0
    assert row["n_triangles"] == 0


def test_entity_resolution_pipeline_on_crafted_dups(spark, tmp_path):
    """E11 end-to-end on a corpus with two planted duplicate groups:
    clusters form, the longest member becomes canonical, singletons
    stay out."""
    from mcyj_datapipeline_spark import registry

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", len(base)),
        (2, base + " ok", "en", len(base) + 3),
        (3, base + " ok yes", "en", len(base) + 7),
        (4, "completely unrelated text about spark physical plans", "en", 52),
        (5, "short doc one two three four five six seven eight", "fr", 49),
        (6, "short doc one two three four five six seven eight!!", "fr", 51),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    d = tmp_path / "er"
    (d).mkdir()
    docs.write.parquet(str(d / "documents.parquet"))
    out = {
        r["cluster_id"]: r
        for r in registry.queries()["e11_entity_resolution_pipeline"](
            spark, str(d)
        ).collect()
    }
    assert set(out) == {1, 5}
    assert out[1]["members"] == "1,2,3"
    assert out[1]["canonical_doc"] == 3  # longest member wins
    assert out[5]["members"] == "5,6"
    assert out[5]["canonical_doc"] == 6


def test_pagerank_random_mirrored_graphs_conserve_mass(spark):
    """Seeded random mirrored graphs: ranks are a probability
    distribution (sum 1, all positive) and are invariant to edge-list
    order — the groupBy-sum makes the iteration order-insensitive."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(3, 12)
        und = set()
        for _ in range(rng.randint(n - 1, 2 * n)):
            a, b = rng.sample(range(n), 2)
            und.add((f"v{min(a,b)}", f"v{max(a,b)}"))
        pairs = [(a, b) for a, b in und] + [(b, a) for a, b in und]
        ranks = {
            r["node"]: r["rank"]
            for r in pagerank(_edges(spark, pairs), iterations=4).collect()
        }
        assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9), trial
        assert all(v > 0 for v in ranks.values()), trial
        shuffled = pairs[:]
        rng.shuffle(shuffled)
        ranks2 = {
            r["node"]: r["rank"]
            for r in pagerank(
                _edges(spark, shuffled), iterations=4
            ).collect()
        }
        for k in ranks:
            assert ranks2[k] == pytest.approx(ranks[k], abs=1e-12), trial


def test_snm_reversed_pass_catches_head_edits(spark):
    """An edit at the string HEAD breaks forward-sorted adjacency/prefix
    but not the reversed pass — the multi-pass recall case."""
    tail = "shared ending that stays identical for quite a while longer"
    docs = spark.createDataFrame(
        [
            (1, "alpha " + tail, "en"),
            (2, "zulu " + tail, "en"),
            (3, "totally different body of text with nothing shared", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    fwd = sorted_neighborhood_pairs(
        docs, block_col="lang", window=3, prefix_len=12
    )
    rev = sorted_neighborhood_pairs(
        docs, block_col="lang", window=3, prefix_len=12, reverse_key=True
    )
    assert fwd.count() == 0  # heads differ -> forward prefix filter rejects
    assert {(r["id_a"], r["id_b"]) for r in rev.collect()} == {(1, 2)}

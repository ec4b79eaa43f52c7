"""Compensating tests for the rows-only g3c_lpa_warm_restart and the
value-oracled g7b_kcore_after_deletions (round 12, VERDICT r11 #4).

The two contracts proved here:

- semi-synchronous LPA converges where the synchronous schedule
  oscillates (bipartite graphs), its warm restart lands on a genuine
  fixed point of today's graph in fewer sweeps, and a fixed point
  really is absorbing (one more sweep is a no-op);
- k-core maintenance under deletions restricted to the old core is
  EXACT: kcore(G') == kcore(induced(old_core, G')) for G' ⊆ G —
  checked against the cold peel on graphs engineered so the deletion
  actually shrinks the core.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcyj_datapipeline_spark.operators.graph import (
    kcore_nodes,
    kcore_nodes_after_deletions,
    label_propagation_semisync_converged,
)

SF = "/root/testdata/sf0.001"


def _mirror(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


@pytest.fixture(scope="module")
def community_edges(spark):
    # two dense, odd/even-mixed communities plus one bridge — real
    # community structure so the labels are informative
    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    return _mirror(spark, c1 + c2 + [(5, 10)])


def _labels_set(df):
    return {(r["node"], r["label"]) for r in df.collect()}


def test_semisync_converges_where_sync_oscillates(spark):
    """The 2-node bipartite graph: synchronous LPA flips both sides
    every round forever; the semi-synchronous schedule must reach a
    fixed point (one side frozen per half-round)."""
    from mcyj_datapipeline_spark.operators.graph import (
        label_propagation_converged,
    )

    edges = _mirror(spark, [(1, 2)])
    _, its_sync, changed_sync = label_propagation_converged(
        edges, max_iterations=6
    )
    assert changed_sync != 0 and its_sync == 6  # honest oscillation
    labels, sweeps, changed = label_propagation_semisync_converged(
        edges, max_sweeps=6
    )
    assert changed == 0 and sweeps < 6
    # both nodes in one community, label = the smaller id
    assert _labels_set(labels) == {(1, 1), (2, 1)}


def test_semisync_fixed_point_is_absorbing(spark, community_edges):
    labels, sweeps, changed = label_propagation_semisync_converged(
        community_edges, max_sweeps=30
    )
    assert changed == 0 and 0 < sweeps < 30
    again, s2, c2 = label_propagation_semisync_converged(
        community_edges, max_sweeps=1, start_labels=labels
    )
    assert c2 == 0 and s2 == 1  # one more sweep: no flips
    assert _labels_set(again) == _labels_set(labels)
    # and the labels carve the two communities
    got = dict(_labels_set(labels))
    assert len({got[i] for i in range(6)}) == 1
    assert len({got[i] for i in range(10, 16)}) == 1


def test_semisync_warm_restart_fewer_sweeps_and_fixed_point(
    spark, community_edges
):
    """Nightly shape: converge on yesterday (one bridge edge gone),
    warm-restart today. Warm must be a fixed point of TODAY's graph
    and take no more sweeps than cold."""
    yday = community_edges.filter(
        ~(
            ((F.col("src") == 5) & (F.col("dst") == 10))
            | ((F.col("src") == 10) & (F.col("dst") == 5))
        )
    )
    ylab, _, yc = label_propagation_semisync_converged(yday, max_sweeps=30)
    assert yc == 0
    cold, cold_sweeps, _ = label_propagation_semisync_converged(
        community_edges, max_sweeps=30
    )
    warm, warm_sweeps, wc = label_propagation_semisync_converged(
        community_edges, max_sweeps=30, start_labels=ylab
    )
    assert wc == 0 and warm_sweeps <= cold_sweeps
    # absorbing check on the warm result specifically
    _, s1, c1 = label_propagation_semisync_converged(
        community_edges, max_sweeps=1, start_labels=warm
    )
    assert c1 == 0 and s1 == 1


def test_semisync_guards(spark, community_edges):
    with pytest.raises(ValueError, match="max_sweeps"):
        label_propagation_semisync_converged(community_edges, max_sweeps=0)


@pytest.mark.heavytier
def test_kcore_after_deletions_exact_vs_cold(spark):
    """Deletions that genuinely shrink the core: two 4-cliques joined
    by a chain; k=3. Deleting one clique edge demotes two nodes out
    of the 3-core. The warm peel (old-core-induced only) must equal
    the cold peel on today's graph."""
    cl1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cl2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    chain = [(3, 20), (20, 21), (21, 10)]
    yday = spark.createDataFrame(cl1 + cl2 + chain, ["a", "b"])
    old_core = kcore_nodes(yday, k=3, rounds=6)
    assert {r["node"] for r in old_core.collect()} == set(range(4)) | set(
        range(10, 14)
    )
    # today: clique-1 loses edge (0,1) -> its nodes drop below k=3
    today = yday.filter(~((F.col("a") == 0) & (F.col("b") == 1)))
    warm = kcore_nodes_after_deletions(today, old_core, k=3, rounds=6)
    cold = kcore_nodes(today, k=3, rounds=6)
    assert [r["node"] for r in warm.collect()] == [
        r["node"] for r in cold.collect()
    ]
    assert {r["node"] for r in warm.collect()} == set(range(10, 14))


@pytest.mark.heavytier
def test_kcore_after_deletions_no_deletions_is_identity(spark):
    cl = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges = spark.createDataFrame(cl + [(0, 99)], ["a", "b"])
    core = kcore_nodes(edges, k=3, rounds=5)
    again = kcore_nodes_after_deletions(edges, core, k=3, rounds=5)
    assert [r["node"] for r in again.collect()] == [
        r["node"] for r in core.collect()
    ]


@pytest.mark.heavytier
def test_g3c_registry_query_shape(spark, sf_dir):
    from mcyj_datapipeline_spark import registry

    df = registry.queries()["g3c_lpa_warm_restart"](spark, sf_dir)
    rows = df.limit(3).collect()
    assert rows and set(df.columns) == {
        "node",
        "label",
        "cold_sweeps",
        "warm_sweeps",
        "changed_at_stop",
    }
    r = rows[0]
    assert r["changed_at_stop"] == 0  # converged (semisync schedule)
    assert 1 <= r["warm_sweeps"] <= r["cold_sweeps"]


@pytest.mark.heavytier
def test_kcore_after_insertions_joiners_found(spark):
    """The mirror of the deletion test: yesterday clique-1 is missing
    edge (0,1) (its nodes below k=3), today it's inserted — the warm
    path must discover the joining clique via candidate expansion and
    equal the cold peel."""
    from mcyj_datapipeline_spark.operators.graph import (
        kcore_nodes_after_insertions,
    )

    cl1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cl2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    chain = [(3, 20), (20, 21), (21, 10)]
    today = spark.createDataFrame(cl1 + cl2 + chain, ["a", "b"])
    yday = today.filter(~((F.col("a") == 0) & (F.col("b") == 1)))
    inserted = today.filter((F.col("a") == 0) & (F.col("b") == 1))
    old_core = kcore_nodes(yday, k=3, rounds=6)
    assert {r["node"] for r in old_core.collect()} == set(range(10, 14))
    warm, expand_rounds = kcore_nodes_after_insertions(
        today, inserted, old_core, k=3, rounds=6
    )
    cold = kcore_nodes(today, k=3, rounds=6)
    assert [r["node"] for r in warm.collect()] == [
        r["node"] for r in cold.collect()
    ]
    assert {r["node"] for r in warm.collect()} == set(range(4)) | set(
        range(10, 14)
    )
    assert expand_rounds >= 1  # the clique really was traversed


def test_kcore_after_insertions_multi_round_expansion(spark):
    """A broken 6-cycle at k=2: inserting the closing edge makes the
    WHOLE cycle join, and the joiners form a chain that needs several
    expansion rounds to reach — the closure loop, not just the seed
    neighborhood."""
    from mcyj_datapipeline_spark.operators.graph import (
        kcore_nodes_after_insertions,
    )

    cycle = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    today = spark.createDataFrame(cycle + [(6, 1)], ["a", "b"])
    yday = spark.createDataFrame(cycle, ["a", "b"])
    inserted = spark.createDataFrame([(6, 1)], ["a", "b"])
    old_core = kcore_nodes(yday, k=2, rounds=6)
    assert old_core.count() == 0  # a path has no 2-core
    warm, expand_rounds = kcore_nodes_after_insertions(
        today, inserted, old_core, k=2, rounds=6
    )
    assert {r["node"] for r in warm.collect()} == {1, 2, 3, 4, 5, 6}
    assert expand_rounds >= 2  # chain traversal, not one hop


def test_kcore_after_insertions_identity_cases(spark):
    """No insertions → old core unchanged, zero expansion rounds; an
    insertion between two core nodes (no eligible non-core seed) →
    same."""
    from mcyj_datapipeline_spark.operators.graph import (
        kcore_nodes_after_insertions,
    )

    cl = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges = spark.createDataFrame(cl + [(0, 99)], ["a", "b"])
    core = kcore_nodes(edges, k=3, rounds=5)
    empty = spark.createDataFrame([], "a long, b long")
    same, rounds0 = kcore_nodes_after_insertions(
        edges, empty, core, k=3, rounds=5
    )
    assert rounds0 == 0
    assert [r["node"] for r in same.collect()] == [
        r["node"] for r in core.collect()
    ]


def test_kcore_after_insertions_refuses_unclosed_expansion(spark):
    """Exactness over availability: a bound too small to close the
    traversal must raise, never return a silently-partial core."""
    import pytest as _pytest

    from mcyj_datapipeline_spark.operators.graph import (
        kcore_nodes_after_insertions,
    )

    cycle = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    today = spark.createDataFrame(cycle + [(6, 1)], ["a", "b"])
    yday = spark.createDataFrame(cycle, ["a", "b"])
    inserted = spark.createDataFrame([(6, 1)], ["a", "b"])
    old_core = kcore_nodes(yday, k=2, rounds=6)
    with _pytest.raises(RuntimeError, match="did not close"):
        kcore_nodes_after_insertions(
            today, inserted, old_core, k=2, rounds=6, max_expand_rounds=1
        )
